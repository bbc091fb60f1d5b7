"""GIF89a writer tests (utils/gif.py — the reference README's per-model
training GIFs, SURVEY.md §3.3)."""

import numpy as np
import pytest

from generative_models_tpu.utils.gif import (
    _lzw_encode, pngs_to_gif, read_png_gray, write_gif_gray,
)
from generative_models_tpu.utils.viz import save_image_grid


def _lzw_decode(data, min_code_size=8):
    """Reference GIF-LZW decoder (spec Appendix F semantics: decoder
    grows code width one table entry before the encoder's count)."""
    clear = 1 << min_code_size
    end = clear + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = nbits = pos = 0
    out = bytearray()
    prev = None
    while True:
        while nbits < code_size:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise AssertionError(f"bad code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1


@pytest.mark.parametrize("payload", [
    b"aaaaabbbbbccccc" * 10,
    bytes(np.tile(np.arange(256, dtype=np.uint8), 30)),
    bytes((np.random.default_rng(0).random(30000) * 255).astype(np.uint8)),
])
def test_lzw_roundtrip(payload):
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_gif_pil_decodes_exactly(tmp_path):
    """Cross-check the whole file against an independent decoder."""
    PIL = pytest.importorskip("PIL.Image")
    from PIL import ImageSequence
    rng = np.random.default_rng(1)
    frames = [(rng.random((50, 70)) * 255).astype(np.uint8)
              for _ in range(4)]
    path = write_gif_gray(str(tmp_path / "a.gif"), frames, delay_cs=12)
    im = PIL.open(path)
    dec = [np.asarray(f.convert("L")) for f in ImageSequence.Iterator(im)]
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        np.testing.assert_array_equal(a, b)


def test_png_reader_roundtrips_grid(tmp_path):
    imgs = np.random.default_rng(2).random((16, 28, 28)).astype(np.float32)
    p = save_image_grid(str(tmp_path / "g.png"), imgs)
    arr = read_png_gray(p)
    assert arr.dtype == np.uint8 and arr.ndim == 2 and arr.shape[0] > 28


def test_pngs_to_gif(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        paths.append(save_image_grid(
            str(tmp_path / f"f{i}.png"),
            rng.random((16, 28, 28)).astype(np.float32)))
    out = pngs_to_gif(paths, str(tmp_path / "t.gif"))
    blob = open(out, "rb").read()
    assert blob[:6] == b"GIF89a" and blob[-1:] == b"\x3B"


def test_lzw_roundtrip_property():
    """Property: arbitrary byte payloads round-trip (hypothesis)."""
    hyp = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=0, max_size=4096))
    def check(payload):
        if payload:
            assert _lzw_decode(_lzw_encode(payload)) == payload
        else:
            # empty frame: encoder emits clear+end only
            assert _lzw_decode(_lzw_encode(payload)) == b""

    check()


def test_make_gifs_main(tmp_path, monkeypatch):
    """benchmarks/make_gifs.py end-to-end on a fake runs/ tree:
    stitches matching-shape frames, skips variants without frames,
    patches the variant doc."""
    import importlib.util
    import os
    import sys as _sys
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_gifs", os.path.join(repo_root, "benchmarks", "make_gifs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    run_dir = tmp_path / "runs" / "nsgan"
    for i in range(4):
        save_image_grid(str(run_dir / f"epoch{i:03d}.png"),
                        rng.random((16, 28, 28)).astype(np.float32))
    # one off-shape frame must be filtered, not crash the stitch
    save_image_grid(str(run_dir / "epoch990.png"),
                    rng.random((4, 28, 28)).astype(np.float32), nrow=2)
    docs = tmp_path / "docs"
    (docs / "nsgan.md").parent.mkdir(parents=True, exist_ok=True)
    (docs / "nsgan.md").write_text("# NSGAN\n\n| samples | losses |\n")
    out = tmp_path / "gallery"

    monkeypatch.setattr(_sys, "argv", [
        "make_gifs.py", "--runs", str(tmp_path / "runs"),
        "--out", str(out), "--docs", str(docs), "--max-frames", "3"])
    assert mod.main() == 0
    gif = out / "nsgan_train.gif"
    assert gif.exists() and gif.read_bytes()[:6] == b"GIF89a"
    assert "nsgan_train.gif" in (docs / "nsgan.md").read_text()
    # the MAJORITY shape must win: 3 subsampled frames of the 4
    # consistent grids survive, the stray small grid is dropped —
    # count the GIF's image descriptors (0x2C separator blocks)
    PIL = pytest.importorskip("PIL.Image")
    from PIL import ImageSequence
    dec = list(ImageSequence.Iterator(PIL.open(str(gif))))
    assert len(dec) == 3
    big = save_image_grid(str(tmp_path / "ref.png"),
                          np.zeros((16, 28, 28), np.float32))
    assert dec[0].size == PIL.open(big).size  # 16-sample grid, not 4
