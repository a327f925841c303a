"""PDF standard-security-handler primitives (ISO 32000 §7.6).

The AES core is pinned to FIPS-197 appendix vectors and the derived
S-box to the spec's published table values; RC4 to its classic
published vectors.  Handler algorithms (2-7) are proven by
self-consistency (compute /O //U, then authenticate as user AND
owner) plus the end-to-end encrypted-document round trips in
test_pdf.py.
"""

import pytest

from atlas_upscaling_dask_spark.sources.pdf_crypt import (
    _INV_SBOX,
    _SBOX,
    _decrypt_block,
    _encrypt_block,
    _hash_2b,
    _key_expansion,
    aes_decrypt_cbc,
    aes_encrypt_cbc,
    authenticate,
    compute_file_key,
    compute_o,
    compute_u,
    object_key,
    rc4,
)


def test_aes128_fips197_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _key_expansion(key))
    assert ct == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert _decrypt_block(ct, _key_expansion(key)) == pt


def test_aes256_fips197_c3():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _key_expansion(key))
    assert ct == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert _decrypt_block(ct, _key_expansion(key)) == pt


def test_derived_sbox_matches_published_values():
    # spot values from the FIPS-197 §5.1.1 table
    assert _SBOX[0x00] == 0x63
    assert _SBOX[0x01] == 0x7C
    assert _SBOX[0x53] == 0xED
    assert _SBOX[0xFF] == 0x16
    assert all(_INV_SBOX[_SBOX[x]] == x for x in range(256))


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert (
        rc4(b"Secret", b"Attack at dawn").hex()
        == "45a01f645fc35b383552544b9bf5"
    )
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_cbc_round_trip_and_named_errors():
    key = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 64):
        data = bytes(range(n))
        enc = aes_encrypt_cbc(key, b"\x01" * 16, data)
        assert len(enc) % 16 == 0 and enc[:16] == b"\x01" * 16
        assert aes_decrypt_cbc(key, enc) == data
    with pytest.raises(ValueError, match="not IV"):
        aes_decrypt_cbc(key, b"short")
    enc = aes_encrypt_cbc(key, b"\x01" * 16, b"payload")
    with pytest.raises(ValueError, match="padding"):
        aes_decrypt_cbc(bytes(16), enc)  # wrong key -> bad padding


@pytest.mark.parametrize(
    "r,klen", [(2, 5), (3, 16), (4, 16)]
)
def test_handler_self_consistency_user_and_owner(r, klen):
    id0 = bytes(range(16))
    o = compute_o(b"owner-pw", b"user-pw", r, klen)
    key = compute_file_key(b"user-pw", o, -44, id0, r, klen)
    assert len(key) == klen
    u = compute_u(key, id0, r)
    assert len(u) == 32
    for pw in (b"user-pw", b"owner-pw"):
        got = authenticate(pw, o, u, -44, id0, r, klen)
        assert got == key, pw
    assert authenticate(b"wrong", o, u, -44, id0, r, klen) is None


def test_object_key_shape():
    fk = bytes(range(16))
    k1 = object_key(fk, 6, 0, aes=False)
    k2 = object_key(fk, 7, 0, aes=False)
    assert len(k1) == 16 and k1 != k2
    assert object_key(fk, 6, 0, aes=True) != k1  # sAlT suffix matters
    assert len(object_key(bytes(5), 6, 0, aes=False)) == 10  # n+5


def test_hash_2b_deterministic_and_password_sensitive():
    a = _hash_2b(b"", b"salt8888", b"")
    assert len(a) == 32
    assert a == _hash_2b(b"", b"salt8888", b"")
    assert a != _hash_2b(b"x", b"salt8888", b"")
    assert a != _hash_2b(b"", b"salt8889", b"")


# ---------------------------------------------------------------------------
# property tests (pure-Python primitives — no Spark, generous examples)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    key=st.sampled_from([16, 32]).flatmap(
        lambda n: st.binary(min_size=n, max_size=n)
    ),
    iv=st.binary(min_size=16, max_size=16),
    data=st.binary(min_size=0, max_size=200),
)
def test_property_cbc_round_trip(key, iv, data):
    assert aes_decrypt_cbc(key, aes_encrypt_cbc(key, iv, data)) == data


@settings(max_examples=50, deadline=None)
@given(
    key=st.binary(min_size=1, max_size=32),
    data=st.binary(min_size=0, max_size=200),
)
def test_property_rc4_symmetric(key, data):
    assert rc4(key, rc4(key, data)) == data


@settings(max_examples=25, deadline=None)
@given(
    user_pw=st.binary(min_size=0, max_size=16),
    owner_pw=st.binary(min_size=1, max_size=16),
    id0=st.binary(min_size=16, max_size=16),
    r=st.sampled_from([2, 3, 4]),
)
def test_property_handler_authenticates_both_passwords(
    user_pw, owner_pw, id0, r
):
    """For ANY password pair and file id, /O //U computed by
    Algorithms 3-5 must authenticate under BOTH passwords (Algorithms
    6-7) and yield the same file key."""
    klen = 5 if r == 2 else 16
    o = compute_o(owner_pw, user_pw, r, klen)
    key = compute_file_key(user_pw, o, -44, id0, r, klen)
    u = compute_u(key, id0, r)
    assert authenticate(user_pw, o, u, -44, id0, r, klen) == key
    got = authenticate(owner_pw, o, u, -44, id0, r, klen)
    # owner path recovers the padded user password -> same key (when
    # owner != user the owner branch runs; when equal, user branch)
    assert got == key
