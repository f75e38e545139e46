"""AES (FIPS 197) from scratch — the cipher under PDF AESV2/AESV3.

Reference contract: the reference refuses encrypted PDFs outright (its
ingest is raster-only), but post-2008 encrypted PDFs are overwhelmingly
AES, so the pipeline's born-digital tier needs the cipher the way it
needs Flate: stdlib-only, no third-party crypto in the container.

Shape: the S-box is GENERATED from its definition (multiplicative
inverse in GF(2^8) + the affine transform), not transcribed; round keys
follow §5.2; the block transforms follow §5.1/§5.3 in the flat
column-major byte layout (index = row + 4*column).

Scale split, like the image codecs: `encrypt_cbc` is scalar Python —
fixture/writer side only (CBC encryption is inherently sequential).
`decrypt_cbc` is the product surface and is numpy-VECTORIZED across
blocks: CBC decryption has no inter-block dependency (each plaintext =
D(c_i) xor c_{i-1}), so a 1 MiB encrypted stream decrypts as ~65k-block
array passes (table lookups + xors), not a per-byte Python loop.

Correctness is pinned against the FIPS 197 Appendix C known-answer
vectors (AES-128 and AES-256) plus encrypt/decrypt roundtrip fuzz in
tests/test_aes.py.
"""

from __future__ import annotations

import numpy as np


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply, reduction polynomial x^8+x^4+x^3+x+1 (0x11B)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[list[int], list[int]]:
    """§5.1.1: S-box = affine transform of the multiplicative inverse —
    generated from the definition via exp/log tables on generator 3."""
    exp = [0] * 255
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    sbox = [0] * 256
    for a in range(256):
        inv = 0 if a == 0 else exp[(255 - log[a]) % 255]
        b, s = inv, inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[a] = s ^ 0x63
    inv_sbox = [0] * 256
    for a, s in enumerate(sbox):
        inv_sbox[s] = a
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()

# GF-multiply lookup tables for MixColumns / InvMixColumns
_MUL = {m: [_gf_mul(x, m) for x in range(256)]
        for m in (2, 3, 9, 11, 13, 14)}

# numpy views for the vectorized decrypt path
_NP_INV_SBOX = np.array(_INV_SBOX, dtype=np.uint8)
_NP_MUL = {m: np.array(t, dtype=np.uint8) for m, t in _MUL.items()}

# flat-index permutations (index = row + 4*column)
_SHIFT = [(r + 4 * ((c + r) % 4)) for c in range(4) for r in range(4)]
_INV_SHIFT = [(r + 4 * ((c - r) % 4)) for c in range(4) for r in range(4)]
_NP_INV_SHIFT = np.array(_INV_SHIFT, dtype=np.int64)


def _expand_key(key: bytes) -> list[list[int]]:
    """§5.2 key expansion -> one 16-int list per round (Nr+1 rounds)."""
    nk = len(key) // 4
    if nk not in (4, 8) or len(key) % 4:
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]                      # RotWord
            t = [_SBOX[b] for b in t]              # SubWord
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum((w[4 * r + c] for c in range(4)), [])
            for r in range(nr + 1)]


class AES:
    """One expanded key; block ops + CBC modes."""

    __slots__ = ("_rk", "_nr", "_np_rk")

    def __init__(self, key: bytes) -> None:
        self._rk = _expand_key(key)
        self._nr = len(self._rk) - 1
        self._np_rk = [np.array(rk, dtype=np.uint8) for rk in self._rk]

    # ------------------------------------------------ scalar block ops

    def encrypt_block(self, block: bytes) -> bytes:
        s = [b ^ k for b, k in zip(block, self._rk[0])]
        mul2, mul3 = _MUL[2], _MUL[3]
        for rnd in range(1, self._nr):
            s = [_SBOX[s[i]] for i in _SHIFT]      # SubBytes + ShiftRows
            t = [0] * 16
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c:c + 4]
                t[c] = mul2[a0] ^ mul3[a1] ^ a2 ^ a3
                t[c + 1] = a0 ^ mul2[a1] ^ mul3[a2] ^ a3
                t[c + 2] = a0 ^ a1 ^ mul2[a2] ^ mul3[a3]
                t[c + 3] = mul3[a0] ^ a1 ^ a2 ^ mul2[a3]
            rk = self._rk[rnd]
            s = [t[i] ^ rk[i] for i in range(16)]
        s = [_SBOX[s[i]] for i in _SHIFT]
        rk = self._rk[self._nr]
        return bytes(s[i] ^ rk[i] for i in range(16))

    def decrypt_block(self, block: bytes) -> bytes:
        return bytes(self._decrypt_blocks(
            np.frombuffer(block, dtype=np.uint8).reshape(1, 16))[0])

    # --------------------------------------- vectorized multi-block core

    def _decrypt_blocks(self, blocks: np.ndarray) -> np.ndarray:
        """(n, 16) uint8 ciphertext blocks -> (n, 16) plaintext (ECB);
        every AES round is an array pass, no per-block Python."""
        m9, m11 = _NP_MUL[9], _NP_MUL[11]
        m13, m14 = _NP_MUL[13], _NP_MUL[14]
        s = blocks ^ self._np_rk[self._nr]
        for rnd in range(self._nr - 1, 0, -1):
            s = _NP_INV_SBOX[s[:, _NP_INV_SHIFT]]  # InvShiftRows+InvSub
            s ^= self._np_rk[rnd]
            cols = s.reshape(-1, 4, 4)
            b0, b1 = cols[:, :, 0], cols[:, :, 1]
            b2, b3 = cols[:, :, 2], cols[:, :, 3]
            out = np.empty_like(cols)
            out[:, :, 0] = m14[b0] ^ m11[b1] ^ m13[b2] ^ m9[b3]
            out[:, :, 1] = m9[b0] ^ m14[b1] ^ m11[b2] ^ m13[b3]
            out[:, :, 2] = m13[b0] ^ m9[b1] ^ m14[b2] ^ m11[b3]
            out[:, :, 3] = m11[b0] ^ m13[b1] ^ m9[b2] ^ m14[b3]
            s = out.reshape(-1, 16)
        s = _NP_INV_SBOX[s[:, _NP_INV_SHIFT]]
        return s ^ self._np_rk[0]

    # ------------------------------------------------------- CBC modes

    def encrypt_cbc(self, iv: bytes, data: bytes,
                    pad: bool = True) -> bytes:
        """CBC encrypt (fixture/writer side — inherently sequential).
        pad=True applies PKCS#7; pad=False requires 16-aligned input
        (the AESV3 /UE-/OE shape)."""
        if pad:
            n = 16 - len(data) % 16
            data = data + bytes([n]) * n
        elif len(data) % 16:
            raise ValueError("unpadded CBC needs 16-aligned input")
        out = bytearray()
        prev = iv
        for i in range(0, len(data), 16):
            prev = self.encrypt_block(
                bytes(a ^ b for a, b in zip(data[i:i + 16], prev)))
            out += prev
        return bytes(out)

    def decrypt_cbc(self, iv: bytes, data: bytes,
                    pad: bool = True) -> bytes:
        """CBC decrypt, vectorized across blocks: plaintext_i = D(c_i)
        xor c_{i-1} has no chain dependency once every D(c_i) is batch-
        computed, so the whole stream is a handful of numpy passes."""
        if len(data) % 16 or (pad and not data):
            raise ValueError("AES-CBC data not 16-aligned")
        if not data:
            return b""
        blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
        plain = self._decrypt_blocks(blocks)
        prev = np.vstack([np.frombuffer(iv, dtype=np.uint8), blocks[:-1]])
        plain ^= prev
        out = plain.tobytes()
        if pad:
            n = out[-1]
            if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
                raise ValueError("AES-CBC bad PKCS#7 padding")
            out = out[:-n]
        return out
