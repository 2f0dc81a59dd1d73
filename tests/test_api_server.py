"""API-server helper parity (ref: examples/serve/api_server.py:92-222).

fastapi is optional in this image, so these tests cover the pure
image-handling helpers: base64 round-trips, multi-image blend modes
(first/list/average/concatenate), and aspect-preserving concatenation.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

_path = os.path.join(os.path.dirname(__file__), "..", "examples", "serve",
                     "api_server.py")
_spec = importlib.util.spec_from_file_location("api_server", _path)
api_server = importlib.util.module_from_spec(_spec)
sys.modules["api_server"] = api_server
_spec.loader.exec_module(api_server)


def _img(w, h, color):
    return Image.fromarray(np.full((h, w, 3), color, dtype=np.uint8))


def test_base64_round_trip():
    img = _img(8, 6, 200)
    b64 = api_server.image_to_base64(img)
    back = api_server.base64_to_image(b64)
    assert back.size == (8, 6)
    assert np.array_equal(np.asarray(back.convert("RGB")), np.asarray(img))


def test_image_to_base64_accepts_ndarray():
    arr = np.zeros((4, 5, 3), dtype=np.uint8)
    back = api_server.base64_to_image(api_server.image_to_base64(arr))
    assert back.size == (5, 4)


def test_blend_first_and_list():
    imgs = [_img(4, 4, 10), _img(4, 4, 250)]
    first = api_server.process_multiple_images(imgs, "first")
    assert np.asarray(first)[0, 0, 0] == 10
    lst = api_server.process_multiple_images(imgs, "list")
    assert isinstance(lst, list) and len(lst) == 2


def test_blend_average_resizes_to_first():
    imgs = [_img(4, 4, 100), _img(8, 8, 200)]
    avg = api_server.process_multiple_images(imgs, "average")
    assert avg.size == (4, 4)
    assert abs(int(np.asarray(avg)[0, 0, 0]) - 150) <= 1


def test_blend_single_image_passthrough():
    out = api_server.process_multiple_images([_img(4, 4, 7)], "average")
    assert isinstance(out, Image.Image) and out.size == (4, 4)


def test_concat_horizontal_aspect_preserving():
    # min height 4; the 8x8 image scales to 4x4 -> total width 6+4
    imgs = [_img(6, 4, 10), _img(8, 8, 20)]
    cat = api_server.concatenate_images(imgs, "horizontal")
    assert cat.size == (10, 4)
    a = np.asarray(cat)
    assert a[0, 0, 0] == 10 and a[0, -1, 0] == 20


def test_concat_vertical_aspect_preserving():
    imgs = [_img(4, 6, 10), _img(8, 8, 20)]
    cat = api_server.concatenate_images(imgs, "vertical")
    assert cat.size == (4, 10)
    a = np.asarray(cat)
    assert a[0, 0, 0] == 10 and a[-1, 0, 0] == 20


def test_blend_concatenate_mode_dispatch():
    imgs = [_img(4, 4, 10), _img(4, 4, 20)]
    cat = api_server.process_multiple_images(imgs, "concatenate", "horizontal")
    assert cat.size == (8, 4)


def test_video_to_base64_mp4():
    pytest.importorskip("imageio")
    import base64

    frames = np.zeros((3, 16, 16, 3), dtype=np.uint8)
    try:
        b64 = api_server.video_to_base64_mp4(frames, fps=8)
    except Exception as e:  # pragma: no cover - no ffmpeg backend in image
        pytest.skip(f"mp4 backend unavailable: {e}")
    assert len(base64.b64decode(b64)) > 0
