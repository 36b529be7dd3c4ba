"""Confidential child args (utils/argcrypt.py — the OwlLive
arg-encryption role, apps/livestitching/encryptor.cpp:25-59)."""

import secrets

import pytest

from octvr_tpu.utils.argcrypt import (
    ArgCryptError,
    ENV_KEY,
    decrypt_args,
    encrypt_args,
    load_key,
    maybe_decrypt_argv,
)

KEY = bytes(range(32))

ARGV = [
    "--inputs",
    "cam 0.yuv,cam\"1\".yuv",
    "--outputs",
    "rig.dat:128:0",
    "--out",
    "rtmp://live.example/app/STREAM-KEY-s3cr3t",
    "--frames",
    "10",
    "ünïcode",
]


def test_roundtrip():
    blob = encrypt_args(ARGV, KEY)
    assert decrypt_args(blob, KEY) == ARGV
    # blob is printable base64 and never contains the plaintext
    assert "STREAM-KEY" not in blob


def test_nonce_randomized():
    assert encrypt_args(ARGV, KEY) != encrypt_args(ARGV, KEY)


def test_empty_argv():
    assert decrypt_args(encrypt_args([], KEY), KEY) == []


def test_tamper_detected():
    blob = encrypt_args(ARGV, KEY)
    raw = bytearray(__import__("base64").b64decode(blob))
    raw[len(raw) // 2] ^= 0x40
    tampered = __import__("base64").b64encode(bytes(raw)).decode()
    with pytest.raises(ArgCryptError):
        decrypt_args(tampered, KEY)


def test_wrong_key_rejected():
    blob = encrypt_args(ARGV, KEY)
    with pytest.raises(ArgCryptError):
        decrypt_args(blob, secrets.token_bytes(32))


def test_load_key_env(monkeypatch):
    monkeypatch.setenv(ENV_KEY, KEY.hex())
    assert load_key() == KEY
    monkeypatch.setenv(ENV_KEY, "zz")
    with pytest.raises(ArgCryptError):
        load_key()
    monkeypatch.delenv(ENV_KEY)
    with pytest.raises(ArgCryptError):
        load_key()


def test_maybe_decrypt_argv(monkeypatch):
    monkeypatch.setenv(ENV_KEY, KEY.hex())
    blob = encrypt_args(ARGV, KEY)
    assert maybe_decrypt_argv(["--args_enc", blob]) == ARGV
    # anything else passes through untouched
    plain = ["--inputs", "a.yuv"]
    assert maybe_decrypt_argv(plain) == plain
    assert maybe_decrypt_argv([]) == []


def test_stream_cli_unwraps_encrypted_argv(monkeypatch):
    """End-to-end through the real CLI entry: stream.main decrypts
    --args_enc before parsing (the blob here decodes to --help, which
    argparse answers with SystemExit(0) — proof the decrypted argv
    reached the parser)."""
    monkeypatch.setenv(ENV_KEY, KEY.hex())
    from octvr_tpu.cli import stream

    blob = encrypt_args(["--help"], KEY)
    with pytest.raises(SystemExit) as e:
        stream.main(["--args_enc", blob])
    assert e.value.code == 0
