"""Independent NumPy oracle for the feature front-end.

Implements python_speech_features semantics the *literal* way — explicit
frame loop, ``np.fft.rfft``, per-filter triangle loops — deliberately
sharing no code or formulation with the JAX matmul/conv implementation it
validates (which is tested to match within fp32 tolerance; BASELINE.json
north-star "feature tensors bit-matched within fp32 tolerance")."""

import math

import numpy as np

EPS = np.finfo(np.float64).eps


def preemphasis(signal, coeff=0.97):
    return np.append(signal[0], signal[1:] - coeff * signal[:-1])


def framesig(sig, frame_len, frame_step):
    slen = len(sig)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padded = np.concatenate((sig, np.zeros(padlen - slen)))
    frames = np.zeros((numframes, frame_len))
    for t in range(numframes):
        frames[t] = padded[t * frame_step : t * frame_step + frame_len]
    return frames


def powspec(frames, nfft):
    return 1.0 / nfft * np.square(np.abs(np.fft.rfft(frames, nfft)))


def hz2mel(hz):
    return 2595 * np.log10(1 + hz / 700.0)


def mel2hz(mel):
    return 700 * (10 ** (mel / 2595.0) - 1)


def get_filterbanks(nfilt, nfft, samplerate, lowfreq=0, highfreq=None):
    highfreq = highfreq or samplerate / 2
    lowmel, highmel = hz2mel(lowfreq), hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bin = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(0, nfilt):
        for i in range(int(bin[j]), int(bin[j + 1])):
            fbank[j, i] = (i - bin[j]) / (bin[j + 1] - bin[j])
        for i in range(int(bin[j + 1]), int(bin[j + 2])):
            fbank[j, i] = (bin[j + 2] - i) / (bin[j + 2] - bin[j + 1])
    return fbank


def fbank(signal, samplerate=16000, winlen=0.025, winstep=0.01, nfilt=40,
          nfft=512, lowfreq=0, highfreq=None, preemph=0.97, winfunc=None):
    signal = preemphasis(signal, preemph)
    frames = framesig(signal, int(round(winlen * samplerate)), int(round(winstep * samplerate)))
    if winfunc is not None:
        frames = frames * winfunc(frames.shape[1])
    ps = powspec(frames, nfft)
    energy = np.sum(ps, 1)
    energy = np.where(energy == 0, EPS, energy)
    fb = get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq)
    feat = np.dot(ps, fb.T)
    feat = np.where(feat == 0, EPS, feat)
    return feat, energy


def logfbank(signal, **kw):
    feat, _ = fbank(signal, **kw)
    return np.log(feat)


def mfcc(signal, samplerate=16000, numcep=13, nfilt=40, ceplifter=22,
         append_energy=True, **kw):
    feat, energy = fbank(signal, samplerate=samplerate, nfilt=nfilt, **kw)
    feat = np.log(feat)
    # ortho DCT-II over the filter axis, keep numcep
    from scipy.fftpack import dct

    feat = dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    if ceplifter > 0:
        n = np.arange(numcep)
        lift = 1 + (ceplifter / 2.0) * np.sin(np.pi * n / ceplifter)
        feat = feat * lift
    if append_energy:
        feat[:, 0] = np.log(energy)
    return feat


def delta(feat, N=2):
    nframes = len(feat)
    denom = 2 * sum([i**2 for i in range(1, N + 1)])
    dfeat = np.empty_like(feat)
    padded = np.pad(feat, ((N, N), (0, 0)), mode="edge")
    for t in range(nframes):
        dfeat[t] = np.dot(np.arange(-N, N + 1), padded[t : t + 2 * N + 1]) / denom
    return dfeat


def full_frontend(signal, feature_type="logmel", nfilt=40, **kw):
    """base + Δ + ΔΔ stacking, exactly as the reference prep scripts do."""
    if feature_type == "logmel":
        base = logfbank(signal, nfilt=nfilt, **kw)
    else:
        base = mfcc(signal, nfilt=nfilt, **kw)
    d1 = delta(base)
    d2 = delta(d1)
    return np.concatenate([base, d1, d2], axis=1)
