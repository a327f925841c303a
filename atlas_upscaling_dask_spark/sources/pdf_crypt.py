r"""PDF standard security handler (ISO 32000-1 §7.6), pure Python.

A real fraction of crawl PDFs are "encrypted" with an EMPTY user
password — readable by anyone, but opaque to an extractor that stops
at the `/Encrypt` flag.  This module implements the public-spec
standard security handler so the census and text extraction recover
those documents:

* **RC4** (§7.6.2 "Algorithm 1" with the V1/V2 crypt filters):
  the stream cipher from the spec's description (key-scheduling +
  PRGA); 40-bit (V1/R2) and up-to-128-bit (V2/R3) file keys.
* **AES-128-CBC** (§7.6.2 /AESV2, V4/R4): block cipher implemented
  from FIPS-197 (S-box derived from the GF(2^8) inverse + affine
  transform, not transcribed tables), CBC with the 16-byte IV
  prepended to the ciphertext and PKCS#5 padding, per §7.6.2.
* **AES-256-CBC** (§7.6.4.3 /AESV3, V5/R6, PDF 2.0): SHA-2 family
  hardened hash (Algorithm 2.B) with the AES-128 core generalized to
  Nk=8.
* **Key derivation** (§7.6.3.3): Algorithm 2 (file key from password
  + /O + /P + /ID), Algorithm 3 (/O), Algorithms 4/5 (/U),
  Algorithms 6/7 (authenticate user/owner password), and the
  per-object key of Algorithm 1 (MD5 over key + object number +
  generation, plus the "sAlT" suffix for AES).

Everything here is data-recovery plumbing for the PDF source — NOT a
security product: the fixture writer uses deterministic IVs so oracle
rows hash stably, and no attempt is made at constant-time operation.

Reference parity note: the reference repo has no document formats;
this supports the crawl-corpus extension scope in `sources/pdf.py`.
"""

from __future__ import annotations

import functools
import hashlib
import struct

__all__ = [
    "rc4",
    "aes_encrypt_cbc",
    "aes_decrypt_cbc",
    "compute_o",
    "compute_u",
    "compute_file_key",
    "authenticate",
    "object_key",
    "decrypt_object",
    "encrypt_object",
]


# ---------------------------------------------------------------------------
# RC4 (the spec's "encryption algorithm" for V1/V2 crypt filters)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197), Nk=4 (AES-128) and Nk=8 (AES-256)
#
# The S-box is DERIVED at import: multiplicative inverse in GF(2^8)
# mod x^8+x^4+x^3+x+1 (0x11B), then the affine transform
# b'_i = b_i ^ b_{i+4} ^ b_{i+5} ^ b_{i+6} ^ b_{i+7} ^ c_i with
# c = 0x63 — FIPS-197 §5.1.1, no transcribed tables to get wrong.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        r = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            r |= bit << i
        sbox[x] = r
    invbox = bytearray(256)
    for x in range(256):
        invbox[sbox[x]] = x
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
# GF multiplication tables for MixColumns / InvMixColumns coefficients
_MUL = {
    c: bytes(_gf_mul(c, x) for x in range(256))
    for c in (2, 3, 9, 11, 13, 14)
}


@functools.lru_cache(maxsize=1024)
def _key_expansion(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2: round keys as a list of 16-byte blocks.
    Memoized: every stream of a document reuses its object key."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 128 or 256 bits")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        temp = words[i - 1]
        if i % nk == 0:
            temp = bytes(
                _SBOX[temp[(j + 1) % 4]] ^ (rcon if j == 0 else 0)
                for j in range(4)
            )
            rcon = _gf_mul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], temp)))
    return [
        b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)
    ]


# state is a 16-byte array in COLUMN-major order (FIPS-197 §3.4):
# byte index = row + 4*col, i.e. the input block laid out as-is.

# InvShiftRows index map (decryption stays the readable byte-wise
# form — it only ever sees short stream payloads; the T-table word
# path below is encryption-only, where Algorithm 2.B's volume lives)
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _build_te() -> tuple[list[int], list[int], list[int], list[int]]:
    """Encryption T-tables (the classic SubBytes+ShiftRows+MixColumns
    fusion — each table DERIVED from the generated S-box and GF
    multiples, 32-bit big-endian column words with row 0 in the MSB):
    ``Te0[x] = (2·S[x], S[x], S[x], 3·S[x])`` and Te1-3 its byte
    rotations.  This is an algebraic regrouping of FIPS-197 §5.1, not
    a different cipher; the appendix-vector tests pin equivalence."""
    m2, m3 = _MUL[2], _MUL[3]
    te0 = [
        (m2[s] << 24) | (s << 16) | (s << 8) | m3[s]
        for s in _SBOX
    ]
    te1 = [((w >> 8) | (w << 24)) & 0xFFFFFFFF for w in te0]
    te2 = [((w >> 16) | (w << 16)) & 0xFFFFFFFF for w in te0]
    te3 = [((w >> 24) | (w << 8)) & 0xFFFFFFFF for w in te0]
    return te0, te1, te2, te3


_TE0, _TE1, _TE2, _TE3 = _build_te()


def _rk_words(rkeys: list[bytes]) -> list[list[int]]:
    """Round keys as 4 big-endian 32-bit column words each."""
    import struct as _s

    return [list(_s.unpack(">4I", rk)) for rk in rkeys]


def _encrypt_words(w0, w1, w2, w3, rkw: list[list[int]]):
    """One block through the T-table rounds; words in/out (the hot
    path for CBC loops — Algorithm 2.B encrypts thousands of blocks
    per password check)."""
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    sbox = _SBOX
    k = rkw[0]
    w0 ^= k[0]
    w1 ^= k[1]
    w2 ^= k[2]
    w3 ^= k[3]
    for r in range(1, len(rkw) - 1):
        k = rkw[r]
        t0 = (
            te0[w0 >> 24]
            ^ te1[(w1 >> 16) & 0xFF]
            ^ te2[(w2 >> 8) & 0xFF]
            ^ te3[w3 & 0xFF]
            ^ k[0]
        )
        t1 = (
            te0[w1 >> 24]
            ^ te1[(w2 >> 16) & 0xFF]
            ^ te2[(w3 >> 8) & 0xFF]
            ^ te3[w0 & 0xFF]
            ^ k[1]
        )
        t2 = (
            te0[w2 >> 24]
            ^ te1[(w3 >> 16) & 0xFF]
            ^ te2[(w0 >> 8) & 0xFF]
            ^ te3[w1 & 0xFF]
            ^ k[2]
        )
        t3 = (
            te0[w3 >> 24]
            ^ te1[(w0 >> 16) & 0xFF]
            ^ te2[(w1 >> 8) & 0xFF]
            ^ te3[w2 & 0xFF]
            ^ k[3]
        )
        w0, w1, w2, w3 = t0, t1, t2, t3
    k = rkw[-1]
    r0 = (
        (sbox[w0 >> 24] << 24)
        | (sbox[(w1 >> 16) & 0xFF] << 16)
        | (sbox[(w2 >> 8) & 0xFF] << 8)
        | sbox[w3 & 0xFF]
    ) ^ k[0]
    r1 = (
        (sbox[w1 >> 24] << 24)
        | (sbox[(w2 >> 16) & 0xFF] << 16)
        | (sbox[(w3 >> 8) & 0xFF] << 8)
        | sbox[w0 & 0xFF]
    ) ^ k[1]
    r2 = (
        (sbox[w2 >> 24] << 24)
        | (sbox[(w3 >> 16) & 0xFF] << 16)
        | (sbox[(w0 >> 8) & 0xFF] << 8)
        | sbox[w1 & 0xFF]
    ) ^ k[2]
    r3 = (
        (sbox[w3 >> 24] << 24)
        | (sbox[(w0 >> 16) & 0xFF] << 16)
        | (sbox[(w1 >> 8) & 0xFF] << 8)
        | sbox[w2 & 0xFF]
    ) ^ k[3]
    return r0, r1, r2, r3


def _encrypt_block(block: bytes, rkeys: list[bytes]) -> bytes:
    import struct as _s

    w = _encrypt_words(*_s.unpack(">4I", block), _rk_words(rkeys))
    return _s.pack(">4I", *w)


def _decrypt_block(block: bytes, rkeys: list[bytes]) -> bytes:
    s = bytes(a ^ b for a, b in zip(block, rkeys[-1]))
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(len(rkeys) - 2, -1, -1):
        # InvShiftRows + InvSubBytes fused
        t = bytes(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
        s = bytes(a ^ b for a, b in zip(t, rkeys[rnd]))
        if rnd > 0:
            out = bytearray(16)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
                out[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
                out[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
                out[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
                out[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
            s = bytes(out)
    return s


def _cbc_encrypt_core(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC over 16-byte-aligned plaintext, word-form chaining (no
    per-block bytes round trips)."""
    import struct as _s

    rkw = _rk_words(_key_expansion(key))
    p0, p1, p2, p3 = _s.unpack(">4I", iv)
    out = bytearray()
    pack, unpack = _s.pack, _s.unpack
    for i in range(0, len(plaintext), 16):
        b0, b1, b2, b3 = unpack(">4I", plaintext[i : i + 16])
        p0, p1, p2, p3 = _encrypt_words(
            b0 ^ p0, b1 ^ p1, b2 ^ p2, b3 ^ p3, rkw
        )
        out += pack(">4I", p0, p1, p2, p3)
    return bytes(out)


def aes_encrypt_cbc(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-CBC with PKCS#5 padding; returns ``iv + ciphertext`` (the
    PDF §7.6.2 stream layout)."""
    pad = 16 - (len(plaintext) % 16)
    plaintext = plaintext + bytes([pad]) * pad
    return iv + _cbc_encrypt_core(key, iv, plaintext)


def aes_decrypt_cbc(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_encrypt_cbc` (IV is ``data[:16]``);
    malformed length or padding is a named error, not garbage."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError(
            f"AES-CBC payload length {len(data)} is not IV + blocks"
        )
    rkeys = _key_expansion(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        dec = _decrypt_block(block, rkeys)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = block
    pad = out[-1] if out else 0
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC padding check failed (wrong key?)")
    return bytes(out[:-pad])


# ---------------------------------------------------------------------------
# standard security handler (§7.6.3)

# §7.6.3.3: the 32-byte padding string (a published constant, part of
# the file format, not a secret)
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _padded(password: bytes) -> bytes:
    return (password + _PAD)[:32]


def compute_file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a (user) password."""
    md = hashlib.md5(_padded(password))
    md.update(o_entry[:32])
    md.update(struct.pack("<i", p))  # P as 32-bit two's complement LE
    md.update(id0)
    if r >= 4 and not encrypt_metadata:
        md.update(b"\xff\xff\xff\xff")
    h = md.digest()
    n = 5 if r == 2 else key_len
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_o(
    owner_pw: bytes, user_pw: bytes, r: int, key_len: int
) -> bytes:
    """Algorithm 3: the /O entry (owner password hash)."""
    h = hashlib.md5(_padded(owner_pw or user_pw)).digest()
    n = 5 if r == 2 else key_len
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R>=3): the /U entry."""
    if r == 2:
        return rc4(file_key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding


def _authenticate_user(
    password: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool,
) -> bytes | None:
    """Algorithm 6: file key when ``password`` is the user password."""
    key = compute_file_key(
        password, o_entry, p, id0, r, key_len, encrypt_metadata
    )
    u = compute_u(key, id0, r)
    ok = u == u_entry if r == 2 else u[:16] == u_entry[:16]
    return key if ok else None


def _authenticate_owner(
    password: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool,
) -> bytes | None:
    """Algorithm 7: recover the user password from /O with the trial
    owner password, then authenticate it via Algorithm 6."""
    h = hashlib.md5(_padded(password)).digest()
    n = 5 if r == 2 else key_len
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    user_padded = o_entry[:32]
    if r == 2:
        user_padded = rc4(key, user_padded)
    else:
        for i in range(19, -1, -1):
            user_padded = rc4(
                bytes(b ^ i for b in key), user_padded
            )
    return _authenticate_user(
        user_padded, o_entry, u_entry, p, id0, r, key_len,
        encrypt_metadata,
    )


# --- V5 / R6 (AES-256, §7.6.4.3 / PDF 2.0) ---------------------------------


@functools.lru_cache(maxsize=4096)
def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B: the R6 iterated SHA-2 hash.

    Pure and deterministic, so results are memoized per process: a
    long-lived Spark python worker authenticates each distinct
    (password, salt, udata) once — repeated passes over the same
    document (census then extraction, or fixture writer then reader)
    pay the 64+-round AES loop a single time."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_encrypt_cbc_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e)
            if mod == 0
            else hashlib.sha384(e)
            if mod == 1
            else hashlib.sha512(e)
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def aes_encrypt_cbc_nopad(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-CBC WITHOUT padding or IV prefix (len must be a multiple of
    16) — the form Algorithm 2.B uses internally."""
    if len(plaintext) % 16:
        raise ValueError("nopad CBC needs 16-byte-aligned input")
    return _cbc_encrypt_core(key, iv, plaintext)


def _aes_decrypt_cbc_nopad(key: bytes, iv: bytes, ct: bytes) -> bytes:
    if len(ct) % 16:
        raise ValueError("nopad CBC needs 16-byte-aligned input")
    rkeys = _key_expansion(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        block = ct[i : i + 16]
        dec = _decrypt_block(block, rkeys)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = block
    return bytes(out)


def _authenticate_v5(
    password: bytes, o_entry: bytes, u_entry: bytes, oe: bytes, ue: bytes
) -> bytes | None:
    """§7.6.4.3.3/4 (R6): validate against /U then /O; on success
    decrypt /UE or /OE to the 32-byte file key."""
    password = password[:127]
    # user password path: /U = hash || validation salt (8) || key salt (8)
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if _hash_2b(password, vsalt, b"") == u_entry[:32]:
        ikey = _hash_2b(password, ksalt, b"")
        return _aes_decrypt_cbc_nopad(ikey, b"\x00" * 16, ue[:32])
    # owner password path: udata is the full 48-byte /U
    vsalt, ksalt = o_entry[32:40], o_entry[40:48]
    if _hash_2b(password, vsalt, u_entry[:48]) == o_entry[:32]:
        ikey = _hash_2b(password, ksalt, u_entry[:48])
        return _aes_decrypt_cbc_nopad(ikey, b"\x00" * 16, oe[:32])
    return None


def authenticate(
    password: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool = True,
    oe: bytes = b"",
    ue: bytes = b"",
) -> bytes | None:
    """Try ``password`` as user then owner password; returns the file
    encryption key, or None when it matches neither."""
    if r >= 5:
        return _authenticate_v5(password, o_entry, u_entry, oe, ue)
    return _authenticate_user(
        password, o_entry, u_entry, p, id0, r, key_len, encrypt_metadata
    ) or _authenticate_owner(
        password, o_entry, u_entry, p, id0, r, key_len, encrypt_metadata
    )


# ---------------------------------------------------------------------------
# per-object keys + object data (Algorithm 1 / 1.A)


def object_key(
    file_key: bytes, objnum: int, gen: int, aes: bool
) -> bytes:
    """Algorithm 1 step (a)-(c): the per-object key (V1/V2/V4).  V5
    uses the file key directly (Algorithm 1.A) — callers pass it
    straight through."""
    md = hashlib.md5(file_key)
    md.update(struct.pack("<I", objnum)[:3])
    md.update(struct.pack("<I", gen)[:2])
    if aes:
        md.update(b"sAlT")  # §7.6.2: the AES salt constant
    return md.digest()[: min(len(file_key) + 5, 16)]


def decrypt_object(
    data: bytes, file_key: bytes, objnum: int, gen: int, cfm: str
) -> bytes:
    """Decrypt one string/stream payload under crypt filter ``cfm``
    ('V2' = RC4, 'AESV2' = AES-128-CBC, 'AESV3' = AES-256-CBC)."""
    if cfm == "V2":
        return rc4(object_key(file_key, objnum, gen, aes=False), data)
    if cfm == "AESV2":
        return aes_decrypt_cbc(
            object_key(file_key, objnum, gen, aes=True), data
        )
    if cfm == "AESV3":
        return aes_decrypt_cbc(file_key, data)
    raise NotImplementedError(f"crypt filter {cfm!r} not supported")


def encrypt_object(
    data: bytes,
    file_key: bytes,
    objnum: int,
    gen: int,
    cfm: str,
    iv: bytes | None = None,
) -> bytes:
    """Writer-side inverse of :func:`decrypt_object` (fixtures).  AES
    callers may pin ``iv`` for byte-determinism."""
    if cfm == "V2":
        return rc4(object_key(file_key, objnum, gen, aes=False), data)
    if cfm in ("AESV2", "AESV3"):
        key = (
            file_key
            if cfm == "AESV3"
            else object_key(file_key, objnum, gen, aes=True)
        )
        if iv is None:
            iv = hashlib.md5(
                b"fixture-iv" + struct.pack("<II", objnum, gen)
            ).digest()
        return aes_encrypt_cbc(key, iv, data)
    raise NotImplementedError(f"crypt filter {cfm!r} not supported")
