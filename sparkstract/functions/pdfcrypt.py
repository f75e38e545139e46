"""PDF standard security handler (ISO 32000 §7.6.3) — RC4 variants.

Reference contract: the reference refuses encrypted PDFs outright (its
ingest is raster-only; PDF wrapping is handled by callers), but real
born-digital corpora carry owner-password-encrypted files whose USER
password is empty — the "restrict printing" shape most generators emit —
and those are readable by design: the standard handler derives the file
key from the EMPTY user password, so a conforming reader decrypts without
any secret. This module implements exactly that path from the spec:

  * algorithm 2   — file encryption key from the (padded) user password
  * algorithm 4/5 — /U verification (R2 / R3+) to authenticate the empty
                    user password; anything else raises a NAMED
                    password-protected error (no guessing)
  * algorithm 1   — per-object key: MD5(key + objnum_le3 + gen_le2)
  * RC4           — the /V 1 (40-bit) and /V 2 (/Length-bit) cipher

AES (/V 4+ with AESV2/AESV3 crypt filters) stays a named out-of-scope
error at the same seam. MD5 comes from hashlib (standard library); RC4 is
the 10-line KSA/PRGA from its public description.

Writer side (fixture-only, like encode_gray_tiff): make_encryption builds
the /O, /U, /P entries and the file key for an R3 128-bit empty-password
document so tests and the pdf_encrypted_page family carry genuinely
encrypted bytes the parser must decrypt.
"""

from __future__ import annotations

import hashlib

# §7.6.3.3 algorithm 2 step a: the 32-byte password pad
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA); encrypt == decrypt."""
    s = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % kl]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def file_key(o_entry: bytes, p: int, id0: bytes, r: int, key_len: int,
             user_pw: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key from the user password."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_entry[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def user_entry(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U value for a given file key."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    enc = rc4(key, digest)
    for i in range(1, 20):
        enc = rc4(bytes(b ^ i for b in key), enc)
    return enc + b"\x00" * 16


def check_user_password(u_entry: bytes, key: bytes, id0: bytes,
                        r: int) -> bool:
    """Authenticate: does this key (derived from the empty user password)
    reproduce /U? R3+ compares the first 16 bytes only (§7.6.3.4)."""
    want = user_entry(key, id0, r)
    if r == 2:
        return u_entry[:32] == want[:32]
    return u_entry[:16] == want[:16]


def owner_entry(owner_pw: bytes, user_pw: bytes, r: int,
                key_len: int) -> bytes:
    """Algorithm 3: the /O value (owner password defaults to user's)."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        # Algorithm 3 step (c) feeds only the first key_len bytes of each
        # digest back in (mirrors file_key) — hashing the full 16 bytes
        # would produce a wrong /O whenever key_len < 16
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    key = key[:key_len]
    enc = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            enc = rc4(bytes(b ^ i for b in key), enc)
    return enc


def object_key(key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    h = hashlib.md5(key + num.to_bytes(4, "little")[:3]
                    + gen.to_bytes(4, "little")[:2]).digest()
    return h[:min(len(key) + 5, 16)]


def make_encryption(id0: bytes, p: int = -44) -> tuple[dict, bytes]:
    """Writer-side: (/Encrypt dict values, file key) for an R3 128-bit
    empty-password document — the restrict-permissions shape real
    generators emit."""
    key_len = 16
    o = owner_entry(b"", b"", 3, key_len)
    key = file_key(o, p, id0, 3, key_len)
    u = user_entry(key, id0, 3)
    return ({"V": 2, "R": 3, "Length": key_len * 8, "P": p,
             "O": o, "U": u}, key)


def reader_key(enc: dict, id0: bytes, deref) -> bytes:
    """Parser-side: derive + authenticate the file key from an /Encrypt
    dict (values possibly indirect) and the first /ID element. Raises a
    NAMED error for non-Standard filters, AES, or a real user password."""
    filt = deref(enc.get("/Filter"))
    if filt != "/Standard":
        raise ValueError(f"PDF encryption filter {filt!r}: out of scope "
                         "(only the Standard security handler)")
    v = int(deref(enc.get("/V", 0)))
    r = int(deref(enc.get("/R", 2)))
    if v not in (1, 2) or r not in (2, 3):
        raise ValueError(
            f"PDF encryption V={v} R={r}: out of scope (RC4 V1/V2 R2/R3 "
            "supported; AES needs upstream decryption)")
    key_len = 5 if v == 1 else int(deref(enc.get("/Length", 40))) // 8
    if not 5 <= key_len <= 16:
        raise ValueError("PDF encryption: bad /Length")
    o = deref(enc.get("/O"))
    u = deref(enc.get("/U"))
    p = int(deref(enc.get("/P", -1)))
    if not (isinstance(o, bytes) and isinstance(u, bytes)):
        raise ValueError("PDF encryption: /O and /U must be strings")
    key = file_key(o, p, id0, r, key_len)
    if not check_user_password(u, key, id0, r):
        raise ValueError("password-protected PDF: a non-empty user "
                         "password is required (decrypt upstream)")
    return key
