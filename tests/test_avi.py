"""MJPEG-AVI writer: container structure + decodable frames.

The environment has no ffmpeg, so shipped video artifacts use the
codec-free MJPEG/AVI path (post/avi.py). This validates the RIFF
container layout and that each frame payload is a real JPEG that decodes
back to the source image.
"""

import io
import struct

import numpy as np
import pytest

from openfoam_tpp_tpu.post.avi import save_video, write_mjpeg_avi


def _frames(n=5, h=48, w=64):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = 10 * i
        f[10:20, 10 + i * 5 : 20 + i * 5, 1] = 255
        f += rng.integers(0, 8, (h, w, 3), dtype=np.uint8)
        out.append(f)
    return out


def test_container_structure(tmp_path):
    frames = _frames()
    path = write_mjpeg_avi(str(tmp_path / "v.avi"), frames, fps=30)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size + 8 == len(data)
    # hdrl list with avih: total frames + dimensions.
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    avih_off = 24
    assert data[avih_off : avih_off + 4] == b"avih"
    fields = struct.unpack("<14I", data[avih_off + 8 : avih_off + 8 + 56])
    assert fields[4] == len(frames)          # dwTotalFrames
    assert (fields[8], fields[9]) == (64, 48)  # width, height
    assert b"MJPG" in data[:300]
    assert b"movi" in data and b"idx1" in data


def test_frames_decode_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    frames = _frames()
    path = write_mjpeg_avi(str(tmp_path / "v.avi"), frames, fps=10,
                           quality=95)
    data = open(path, "rb").read()
    # Walk the movi list, decode every 00dc chunk.
    movi = data.index(b"movi")
    pos = movi + 4
    decoded = []
    while data[pos : pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        jpeg = data[pos + 8 : pos + 8 + size]
        img = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
        decoded.append(img)
        pos += 8 + size + (size % 2)
    assert len(decoded) == len(frames)
    for src, dec in zip(frames, decoded):
        assert dec.shape == src.shape
        # JPEG is lossy; q=95 keeps the mean error small.
        assert np.mean(np.abs(dec.astype(int) - src.astype(int))) < 6.0


def test_save_video_falls_back_to_avi(tmp_path):
    # No ffmpeg in this image: asking for .mp4 must still produce a
    # playable file (cv2-encoded .mp4 or the .avi fallback), not raise.
    out = save_video(str(tmp_path / "anim.mp4"), _frames(3), fps=5)
    assert out.endswith((".mp4", ".avi"))
    head = open(out, "rb").read(12)
    assert head[:4] == b"RIFF" or head[4:8] == b"ftyp"


def test_save_video_mp4_decodes_roundtrip(tmp_path):
    # With OpenCV present (this image bundles its own encoder), the MP4
    # path must produce a real, decodable MPEG-4 file.
    cv2 = pytest.importorskip("cv2")
    frames = _frames(6)
    out = save_video(str(tmp_path / "anim.mp4"), frames, fps=10)
    assert out.endswith(".mp4")
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == len(frames)
    ok, fr = cap.read()
    cap.release()
    assert ok and fr.shape == frames[0].shape
    # BGR -> RGB; lossy codec, mean error stays small.
    dec = fr[..., ::-1].astype(int)
    assert np.mean(np.abs(dec - frames[0].astype(int))) < 12.0
