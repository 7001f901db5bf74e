"""Minimal FLAC *encoder* (test-only) to exercise the native decoder.

Encodes 16-bit mono/stereo PCM as spec-conformant FLAC using verbatim,
constant, or fixed-predictor subframes with rice residuals (partition
order 0), correct UTF-8 frame numbers and CRC-8/CRC-16. Deliberately
independent of csrc/plu_audio.cc.
"""

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out, bits = [], 6
    while n >> bits:
        bits += 5
    nbytes = (bits - 1) // 5
    lead = (0xFF << (7 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * nbytes)))
    for i in range(nbytes - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    return (x << 1) ^ (x >> 63)


def _write_rice(bw: BitWriter, resid: np.ndarray, param: int):
    bw.write(0, 2)  # method: rice 4-bit
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for r in _zigzag(resid):
        q = int(r) >> param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(int(r) & ((1 << param) - 1), param)


_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: BitWriter, samples: np.ndarray, mode: str, bps: int = 16):
    bw.write(0, 1)  # pad
    if mode == "verbatim":
        bw.write(0b000001, 6)
        bw.write(0, 1)  # no wasted bits
        for s in samples:
            bw.write(int(s), bps)
    elif mode == "constant":
        bw.write(0b000000, 6)
        bw.write(0, 1)
        bw.write(int(samples[0]), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(int(s), bps)
        x = samples.astype(np.int64)
        coef = _FIXED_COEF[order]
        resid = x[order:].copy()
        for j, c in enumerate(coef):
            resid -= c * x[order - 1 - j : len(x) - 1 - j]
        mag = int(np.abs(resid).max()) if len(resid) else 0
        param = min(14, max(0, int(np.ceil(np.log2(mag + 1)))))
        _write_rice(bw, resid, param)
    else:
        raise ValueError(mode)


def encode_flac(
    pcm: np.ndarray,  # [N] or [N, C] int16
    sample_rate: int = 16000,
    block_size: int = 4096,
    mode: str = "verbatim",
) -> bytes:
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, channels = pcm.shape

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    si_bytes = bytes(si.bytes) + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_no = 0
    for start in range(0, n, block_size):
        blk = pcm[start : start + block_size]
        bs = blk.shape[0]
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(0b0111, 4)  # 16-bit blocksize-1 follows
        hdr.write(0, 4)  # sample rate from STREAMINFO
        hdr.write(channels - 1, 4)  # independent channels
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes)
        hdr_bytes += _utf8_number(frame_no)
        hdr_bytes += (bs - 1).to_bytes(2, "big")
        hdr_bytes.append(crc8(bytes(hdr_bytes)))

        body = BitWriter()
        for c in range(channels):
            _write_subframe(body, blk[:, c], mode)
        body.align()
        frame = bytes(hdr_bytes) + bytes(body.bytes)
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
