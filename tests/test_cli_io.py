"""CLI driver + image IO + utility modules."""

import numpy as np
import pytest

from raymarching_tpu.cli import build_parser, main
from raymarching_tpu.io.image import save_image, to_uint8
from raymarching_tpu.utils.debug import check_finite, print_v3
from raymarching_tpu.utils.timing import Phase, march_iteration_stats


class TestCli:
    def test_render_to_png(self, tmp_path, scenes_dir):
        out = str(tmp_path / "out.png")
        rc = main(["--scene", str(scenes_dir / "config1.txt"), "--out", out,
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--iterations", "30", "--backend", "jnp",
                   "--normal-mode", "analytic"])
        assert rc == 0
        data = open(out, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    def test_compare_backends(self, tmp_path, scenes_dir, capsys):
        out = str(tmp_path / "out.ppm")
        rc = main(["--scene", str(scenes_dir / "config1.txt"), "--out", out,
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--iterations", "30", "--backend", "ref,jnp",
                   "--compare"])
        assert rc == 0
        captured = capsys.readouterr().out
        assert "max |jnp - ref|" in captured

    def test_animate_gif(self, tmp_path, scenes_dir):
        out = str(tmp_path / "orbit.gif")
        rc = main(["--scene", str(scenes_dir / "config1.txt"), "--out", out,
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--iterations", "30", "--backend", "jnp",
                   "--animate", "3", "--orbit", "90"])
        assert rc == 0
        data = open(out, "rb").read()
        assert data[:6] in (b"GIF87a", b"GIF89a")

    def test_animate_png_frames(self, tmp_path, scenes_dir):
        out = str(tmp_path / "orbit.png")
        rc = main(["--scene", str(scenes_dir / "config1.txt"), "--out", out,
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--iterations", "30", "--backend", "jnp",
                   "--animate", "3"])
        assert rc == 0
        frames = sorted(tmp_path.glob("orbit_*.png"))
        assert len(frames) == 3
        for f in frames:
            assert f.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"

    def test_animate_rejects_compare_and_multibackend(self, tmp_path,
                                                      scenes_dir):
        rc = main(["--scene", str(scenes_dir / "config1.txt"),
                   "--out", str(tmp_path / "a.gif"),
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--animate", "2", "--backend", "ref,jnp", "--compare"])
        assert rc == 2

    def test_row_block_streams_frame(self, tmp_path, scenes_dir):
        out = str(tmp_path / "tiled.png")
        rc = main(["--scene", str(scenes_dir / "config1.txt"), "--out", out,
                   "--width", "16", "--height", "12", "--ssaa", "1",
                   "--iterations", "30", "--backend", "jnp",
                   "--normal-mode", "analytic", "--row-block", "5"])
        assert rc == 0
        assert open(out, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"

    def test_row_block_rejected_in_animate(self, tmp_path, scenes_dir):
        rc = main(["--scene", str(scenes_dir / "config1.txt"),
                   "--out", str(tmp_path / "a.gif"),
                   "--width", "16", "--height", "8", "--ssaa", "1",
                   "--animate", "2", "--row-block", "4"])
        assert rc == 2

    def test_missing_scene(self, tmp_path):
        rc = main(["--scene", "/definitely/not/here.txt",
                   "--out", str(tmp_path / "x.png")])
        assert rc == 2

    def test_bad_extension(self, tmp_path, scenes_dir):
        rc = main(["--scene", str(scenes_dir / "config1.txt"),
                   "--out", str(tmp_path / "x.bmp")])
        assert rc == 2

    def test_parser_defaults_match_reference(self):
        args = build_parser().parse_args(["--scene", "x"])
        # reference constants.h:11-12,14,26 and gamma=1
        assert (args.width, args.height) == (1024, 768)
        assert args.iterations == 1000
        assert args.ssaa == 3
        assert args.gamma == 1.0


class TestImageIO:
    def test_to_uint8_clamps_and_rounds(self):
        img = np.array([[[-0.5, 0.0, 0.5], [1.0, 2.0, 0.998]]], np.float32)
        out = to_uint8(img)
        np.testing.assert_array_equal(out[0, 0], [0, 0, 128])
        np.testing.assert_array_equal(out[0, 1], [255, 255, 254])

    def test_gamma(self):
        img = np.full((1, 1, 3), 0.25, np.float32)
        out = to_uint8(img, gamma=2.0)
        assert abs(int(out[0, 0, 0]) - round(0.5 * 255)) <= 1

    def test_save_rejects_unknown_format(self, tmp_path):
        with pytest.raises(ValueError, match="unsupported"):
            save_image(str(tmp_path / "x.bmp"), np.zeros((2, 2, 3)))

    def test_save_jpeg_dependency_free(self, tmp_path):
        path = str(tmp_path / "x.jpg")
        save_image(path, np.full((8, 8, 3), 0.5, np.float32))
        assert open(path, "rb").read(2) == b"\xff\xd8"  # JPEG SOI

    def test_jpeg_roundtrips_through_pillow(self, tmp_path):
        """Clean-room baseline encoder (io.jpeg) produces standard JFIF a
        third-party decoder reads back near-losslessly at quality 100."""
        pytest.importorskip("PIL")
        import io as _io

        from PIL import Image

        from raymarching_tpu.io.jpeg import encode_jpeg

        rng = np.random.default_rng(7)
        # smooth ramp + hard edges + noise, odd (non-multiple-of-8) size
        x = np.linspace(0, 1, 75)
        img = np.stack([np.outer(np.linspace(0, 1, 53), x)] * 3, -1)
        img[20:30, 30:50] = [1.0, 0.1, 0.1]
        img += rng.normal(0, 0.02, img.shape)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)

        dec = np.asarray(Image.open(
            _io.BytesIO(encode_jpeg(img, 100))).convert("RGB"))
        assert dec.shape == img.shape
        diff = np.abs(dec.astype(int) - img.astype(int))
        assert diff.max() <= 12 and diff.mean() < 1.5


class TestUtils:
    def test_check_finite_raises(self):
        with pytest.raises(FloatingPointError, match="non-finite"):
            check_finite({"a": np.array([1.0, np.nan])}, "t")
        check_finite({"a": np.array([1.0, 2.0])})  # no raise

    def test_phase_timing(self, capsys):
        with Phase("x", rays=1000) as ph:
            ph.sync(np.zeros(3))
        out = capsys.readouterr().out
        assert "[x]" in out and "Mrays/s" in out

    def test_march_stats(self):
        stats = march_iteration_stats(np.array([True, True, False]))
        assert stats["rays"] == 3
        assert stats["converged"] == 2
        assert 0.3 < stats["miss_fraction"] < 0.4
