"""Model registry: hash identification, listing, download resolution
(ref: tests/unit/test_separator_detection.py; separator.py:456-828)."""

import hashlib
import logging
import os

import pytest

from audio_separator_tpu.separator.registry import ModelRegistry, get_model_hash


def test_model_hash_is_md5_of_last_10mb_tail(tmp_path):
    small = tmp_path / "small.ckpt"
    small.write_bytes(b"abc" * 1000)
    assert get_model_hash(str(small)) == hashlib.md5(b"abc" * 1000).hexdigest()

    big = tmp_path / "big.ckpt"
    payload = os.urandom(11_000_000)
    big.write_bytes(payload)
    assert get_model_hash(str(big)) == hashlib.md5(payload[-10_240_000:]).hexdigest()


def test_list_supported_model_files_structure(tmp_path):
    reg = ModelRegistry(str(tmp_path), logging.getLogger("t"), allow_network=False)
    listing = reg.list_supported_model_files()
    assert set(listing) >= {"MDX", "VR", "Demucs", "MDXC"}
    # every entry resolves to filename + download files
    mdxc = listing["MDXC"]
    assert len(mdxc) > 50  # roformer zoo
    any_entry = next(iter(mdxc.values()))
    assert "filename" in any_entry and "download_files" in any_entry


def test_download_missing_model_gives_actionable_error(tmp_path):
    reg = ModelRegistry(str(tmp_path), logging.getLogger("t"), allow_network=False)
    with pytest.raises(Exception) as ei:
        reg.download_model_files("model_bs_roformer_ep_317_sdr_12.9755.ckpt")
    # error should name the model or the network restriction, not be a KeyError
    assert "model_bs_roformer" in str(ei.value) or "network" in str(ei.value).lower()


def test_existing_file_skips_download(tmp_path):
    target = tmp_path / "model_bs_roformer_ep_317_sdr_12.9755.ckpt"
    target.write_bytes(b"x")
    reg = ModelRegistry(str(tmp_path), logging.getLogger("t"), allow_network=False)
    reg.download_file_if_not_exists("https://example.invalid/x.ckpt", str(target))
    assert target.read_bytes() == b"x"
