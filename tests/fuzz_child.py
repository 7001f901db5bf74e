"""Subprocess fuzz driver for the native/python decoders (one format per
invocation, so a crash in the C++ parsers kills THIS process, not the
pytest run — the parent test asserts exit code 0).

    python tests/fuzz_child.py <wav|sphere|flac|mp3|plu> <n_mutations> <seed> <tmpdir>

Seeded byte-level mutations of a valid fixture: flips, truncations,
insertions, zeroed spans, header-targeted flips. Every decode must
either raise a Python exception or return — never crash or hang.
Covers every parser in csrc/plu_audio.cc (WAV/SPHERE/FLAC/MP3) and
csrc/plu_records.cc (.plu + .idx), plus the pure-Python fallbacks.
"""

import os
import sys

import numpy as np


def _pcm(n=4000, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randn(n) * 3000).astype(np.int16)


def make_wav(tmp):
    from phones_las_tpu.data.audio_io import write_wav

    p = os.path.join(tmp, "f.wav")
    write_wav(p, _pcm())
    return open(p, "rb").read(), ".wav"


def make_sphere(tmp):
    hdr = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode()
    hdr += b" " * (1024 - len(hdr))
    return hdr + _pcm().astype("<i2").tobytes(), ".sph"


def make_flac(tmp):
    sys.path.insert(0, os.path.dirname(__file__))
    from flac_encoder import encode_flac

    # both subframe codings → both decode paths get fuzzed
    a = encode_flac(_pcm(2000), mode="verbatim")
    b = encode_flac(_pcm(2000, seed=1), mode="fixed2")
    return [(a, ".flac"), (b, ".flac")]


def make_mp3(tmp):
    sys.path.insert(0, os.path.dirname(__file__))
    import mp3_encoder

    if not mp3_encoder.available():
        print("SKIP: no mp3 encoder available")
        sys.exit(0)
    p = os.path.join(tmp, "f.mp3")
    mp3_encoder.write_mp3(p, _pcm(8000), 16000)
    return open(p, "rb").read(), ".mp3"


def make_plu(tmp):
    from phones_las_tpu.data.records import RecordWriter, Utterance

    p = os.path.join(tmp, "f.plu")
    with RecordWriter(p, meta={"corpus": "fuzz"}) as w:
        for i in range(4):
            w.write(Utterance(
                f"u{i}", _pcm(600 + 137 * i, seed=i),
                np.arange(3 + i, dtype=np.int32),
                np.arange(2 + i, dtype=np.int32), "a b c",
            ))
    data = open(p, "rb").read()
    idx = open(p + ".idx", "rb").read()
    return data, idx


def mutate(rng, data: bytes) -> bytes:
    buf = bytearray(data)
    op = rng.randint(5)
    if op == 0 and len(buf) > 0:  # flip 1-8 random bytes anywhere
        for _ in range(rng.randint(1, 9)):
            buf[rng.randint(len(buf))] = rng.randint(256)
    elif op == 1:  # truncate
        buf = buf[: rng.randint(len(buf) + 1)]
    elif op == 2:  # insert garbage
        pos = rng.randint(len(buf) + 1)
        buf[pos:pos] = bytes(rng.randint(0, 256, rng.randint(1, 64), np.uint8))
    elif op == 3 and len(buf) > 2:  # zero a span
        a = rng.randint(len(buf) - 1)
        b = min(len(buf), a + rng.randint(1, 256))
        buf[a:b] = b"\x00" * (b - a)
    else:  # header-targeted flips (parsers branch on early bytes)
        hdr = min(len(buf), 128)
        for _ in range(rng.randint(1, 5)):
            if hdr:
                buf[rng.randint(hdr)] = rng.randint(256)
    return bytes(buf)


# extreme values for length-field corruption: zero, off-by-one around
# plausible sizes, sign-bit, and all-ones (size_t underflow bait)
_EXTREME_U32 = (0, 1, 2, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFE, 0xFFFFFFFF)


def mutate_mp3_frame_header(rng, data: bytes) -> bytes:
    """Structure-aware MP3 mutation: find a frame sync (0xFF Ex/Fx) and
    flip bits inside the 4-byte frame header — version/layer/bitrate/
    samplerate/padding/channel fields — which byte-level mutation rarely
    hits in a way that keeps the sync valid."""
    buf = bytearray(data)
    syncs = [i for i in range(len(buf) - 4)
             if buf[i] == 0xFF and (buf[i + 1] & 0xE0) == 0xE0]
    if not syncs:
        return mutate(rng, data)
    at = syncs[rng.randint(len(syncs))]
    for _ in range(rng.randint(1, 4)):
        # flip bits in header bytes 1-3 (keep byte 0 = 0xFF so the
        # decoder still treats it as a frame header, not garbage to skip)
        off = at + 1 + rng.randint(3)
        buf[off] ^= 1 << rng.randint(8)
    if rng.randint(2):  # half the time also truncate mid-frame
        buf = buf[: at + rng.randint(4, min(len(buf) - at, 400))]
    return bytes(buf)


def plu_length_field_offsets(data: bytes):
    """Walk the .plu framing (header-len u32, then per-record payload-len
    u32 with nested uid/audio/targets/graphemes/text length fields) and
    return the byte offsets of every length field actually present."""
    import struct

    offs = []
    pos = 0
    if len(data) < 4:
        return offs
    offs.append(0)
    hdr_len = struct.unpack_from("<I", data, 0)[0]
    pos = 4 + hdr_len
    while pos + 4 <= len(data):
        offs.append(pos)  # record payload length
        (plen,) = struct.unpack_from("<I", data, pos)
        payload_start = pos + 4
        # nested fields: uid len, audio n, targets n, graphemes n, text len
        p = payload_start
        for elem_size in (1, 2, 4, 4, 1):
            if p + 4 > len(data) or p + 4 > payload_start + plen:
                break
            offs.append(p)
            (n,) = struct.unpack_from("<I", data, p)
            p += 4 + n * elem_size
        pos = payload_start + plen
    return offs


def mutate_plu_lengths(rng, data: bytes) -> bytes:
    """Structure-aware .plu mutation: overwrite real length fields with
    extreme values (the class of bug that turns into size_t underflow /
    giant reserve() in a native reader)."""
    import struct

    offs = plu_length_field_offsets(data)
    if not offs:
        return mutate(rng, data)
    buf = bytearray(data)
    for _ in range(rng.randint(1, 4)):
        at = offs[rng.randint(len(offs))]
        val = _EXTREME_U32[rng.randint(len(_EXTREME_U32))]
        if rng.randint(2):  # or an off-by-one of the true value
            (true,) = struct.unpack_from("<I", bytes(buf), at)
            val = max(0, true + rng.randint(-2, 3)) & 0xFFFFFFFF
        struct.pack_into("<I", buf, at, val)
    if rng.randint(4) == 0:
        buf = buf[: rng.randint(len(buf) + 1)]
    return bytes(buf)


def fuzz_audio(fmt: str, n: int, seed: int, tmp: str) -> None:
    from phones_las_tpu.data import audio_io

    fixtures = {"wav": make_wav, "sphere": make_sphere,
                "flac": make_flac, "mp3": make_mp3}[fmt](tmp)
    if not isinstance(fixtures, list):
        fixtures = [fixtures]
    # sanity: the unmutated fixtures decode
    for i, (data, ext) in enumerate(fixtures):
        p = os.path.join(tmp, f"ok{i}{ext}")
        open(p, "wb").write(data)
        samples, rate = audio_io.read_audio(p)
        assert samples.size > 0 and rate > 0
    rng = np.random.RandomState(seed)
    ok = err = 0
    for i in range(n):
        data, ext = fixtures[i % len(fixtures)]
        p = os.path.join(tmp, f"m{ext}")
        # every 3rd mp3 mutation is structure-aware (frame-header flips)
        mut = (mutate_mp3_frame_header if fmt == "mp3" and i % 3 == 0
               else mutate)
        open(p, "wb").write(mut(rng, data))
        try:
            audio_io.read_audio(p)
            ok += 1
        except Exception:
            err += 1
    print(f"{fmt}: {ok} decoded, {err} rejected, 0 crashes")


def fuzz_plu(n: int, seed: int, tmp: str) -> None:
    from phones_las_tpu.data.native_records import NativeRecordReader
    from phones_las_tpu.data.records import RecordReader

    data, idx = make_plu(tmp)
    rng = np.random.RandomState(seed)
    use_native = NativeRecordReader.available()
    ok = err = 0
    for i in range(n):
        p = os.path.join(tmp, "m.plu")
        # alternate: corrupt the records, the index, or both; every 3rd
        # record mutation is structure-aware length-field corruption
        which = i % 3
        rec_mut = mutate_plu_lengths if i % 3 == 0 else mutate
        open(p, "wb").write(rec_mut(rng, data) if which != 1 else data)
        open(p + ".idx", "wb").write(
            mutate(rng, idx) if which != 0 else idx)
        try:
            if use_native:
                r = NativeRecordReader(p)
                try:
                    b = min(len(r), 4)
                    if b > 0:
                        audio = np.zeros((b, 2048), np.int16)
                        al = np.zeros(b, np.int32)
                        tg = np.zeros((b, 16), np.int32)
                        tl = np.zeros(b, np.int32)
                        r.lengths()
                        r.read_batch(np.arange(b), audio, al, tg, tl,
                                     eos_id=1, pad_id=0, n_threads=2)
                finally:
                    r.close()
            else:
                for _ in RecordReader(p):
                    pass
            ok += 1
        except Exception:
            err += 1
    print(f"plu[{'native' if use_native else 'python'}]: "
          f"{ok} decoded, {err} rejected, 0 crashes")


def main():
    fmt, n, seed, tmp = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    if fmt == "plu":
        fuzz_plu(n, seed, tmp)
    else:
        fuzz_audio(fmt, n, seed, tmp)


if __name__ == "__main__":
    main()
