"""Backward-compatibility corpus (utils/tfhe-backward-compat-data analog):
serialized artifacts from each released format version live in
tests/compat_corpus/ and must keep deserializing (and decrypting under the
deterministic corpus keys) in every future version."""

import json
from pathlib import Path

import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.utils.serialization import deserialize, serialize

CORPUS = Path(__file__).parent / "compat_corpus"
SEED = 0xC04B05


def _keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=SEED)


def test_corpus_exists_or_generate():
    """First run generates the corpus; later versions must only READ it."""
    CORPUS.mkdir(exist_ok=True)
    manifest_path = CORPUS / "manifest.json"
    if manifest_path.exists():
        return
    ck, _ = _keys()
    artifacts = {
        "shortint_ct_v0.bin": (serialize(ck.key.encrypt(3)), {"value": 3}),
        "radix_ct_v0.bin": (serialize(ck.encrypt_radix(201, 4)), {"value": 201}),
        "signed_ct_v0.bin": (serialize(ck.encrypt_signed_radix(-55, 4)), {"value": -55}),
        "crt_ct_v0.bin": (serialize(ck.encrypt_crt(7, [3, 4])), {"value": 7}),
    }
    manifest = {}
    for name, (blob, meta) in artifacts.items():
        (CORPUS / name).write_bytes(blob)
        manifest[name] = meta
    manifest_path.write_text(json.dumps(manifest, indent=1))


def test_corpus_deserializes_and_decrypts():
    manifest_path = CORPUS / "manifest.json"
    if not manifest_path.exists():
        pytest.skip("corpus not generated yet (ordering)")
    manifest = json.loads(manifest_path.read_text())
    ck, _ = _keys()
    for name, meta in manifest.items():
        obj = deserialize((CORPUS / name).read_bytes())
        if name.startswith("shortint"):
            assert ck.key.decrypt_raw(obj) == meta["value"], name
        elif name.startswith("signed"):
            assert ck.decrypt_signed_radix(obj) == meta["value"], name
        elif name.startswith("crt"):
            assert ck.decrypt_crt(obj) == meta["value"], name
        else:
            assert ck.decrypt_radix(obj) == meta["value"], name
