"""Generate the sample assets docs examples use (reference ships
assets/{audio,img,video} with demo inputs; these are synthesized originals,
small enough to commit).

    python scripts/make_assets.py
"""

import os
import struct
import wave

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def make_wav(path: str, secs: float = 3.0, sr: int = 16000) -> None:
    """Speech-band test tone: three vowel-ish formant chords with an
    envelope, so ASR demos have energy where mel filters look."""
    t = np.arange(int(secs * sr)) / sr
    seg = len(t) // 3
    x = np.zeros_like(t)
    for i, formants in enumerate(((220, 700, 1220), (240, 400, 2000),
                                  (200, 300, 870))):
        s = slice(i * seg, (i + 1) * seg)
        for f in formants:
            x[s] += np.sin(2 * np.pi * f * t[s]) / len(formants)
        x[s] *= np.hanning(seg)
    x = (x * 0.5 * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal PNG writer (no PIL dependency)."""
    import zlib

    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))
    out = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                             0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw, 9))
           + _png_chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(out)


_GLYPHS = {  # 5x7 bitmap font, just enough for the OCR demo string
    "A": "01110100011000111111100011000110001",
    "H": "10001100011000111111100011000110001",
    "T": "11111001000010000100001000010000100",
    "P": "11110100011000111110100001000010000",
    "U": "10001100011000110001100011000101110",
    "-": "00000000000000011111000000000000000",
    "0": "01110100011001110101110011000101110",
    "1": "00100011000010000100001000010001110",
    "2": "01110100010000100110010001000011111",
    " ": "00000000000000000000000000000000000",
}


def draw_text(img: np.ndarray, text: str, x0: int, y0: int,
              scale: int = 4) -> None:
    for ci, ch in enumerate(text):
        bits = _GLYPHS.get(ch, _GLYPHS[" "])
        for r in range(7):
            for c in range(5):
                if bits[r * 5 + c] == "1":
                    y = y0 + r * scale
                    x = x0 + (ci * 6 + c) * scale
                    img[y:y + scale, x:x + scale] = 16


def make_ocr_png(path: str) -> None:
    img = np.full((224, 448, 3), 245, np.uint8)
    draw_text(img, "AHA TPU", 32, 40, scale=6)
    draw_text(img, "2 0 1 1", 32, 120, scale=6)
    write_png(path, img)


def make_photo_png(path: str) -> None:
    """Synthetic 'photo' for VLM-chat / background-removal demos: a bright
    disc and bar on a gradient background."""
    h, w = 256, 256
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    np.full((h, w), 90)], -1).astype(np.uint8)
    disc = (yy - 100) ** 2 + (xx - 128) ** 2 < 48 ** 2
    img[disc] = (250, 210, 60)
    img[180:200, 64:192] = (40, 160, 230)
    write_png(path, img)


def make_video(path: str) -> None:
    """8-frame 64x64 mp4 of a moving square, via any available encoder;
    silently skipped when no container encoder exists in the env."""
    frames = []
    for i in range(8):
        f = np.zeros((64, 64, 3), np.uint8)
        f[8 + i * 5:24 + i * 5, 8 + i * 6:24 + i * 6] = (255, 80 + i * 20, 0)
        frames.append(f)
    try:
        import imageio.v3 as iio

        iio.imwrite(path, np.stack(frames), fps=4)
        return
    except Exception:  # noqa: BLE001
        pass
    try:
        import av

        with av.open(path, "w") as out:
            stream = out.add_stream("mpeg4", rate=4)
            stream.width, stream.height = 64, 64
            stream.pix_fmt = "yuv420p"
            for f in frames:
                frame = av.VideoFrame.from_ndarray(f, format="rgb24")
                out.mux(stream.encode(frame))
            out.mux(stream.encode())
        return
    except Exception:  # noqa: BLE001
        print(f"skipped {path}: no mp4 encoder in this environment")


def main() -> None:
    for sub in ("audio", "img", "video"):
        os.makedirs(os.path.join(ROOT, sub), exist_ok=True)
    make_wav(os.path.join(ROOT, "audio", "sample.wav"))
    make_ocr_png(os.path.join(ROOT, "img", "ocr_test.png"))
    make_photo_png(os.path.join(ROOT, "img", "photo.png"))
    make_video(os.path.join(ROOT, "video", "sample.mp4"))
    print("assets written under", ROOT)


if __name__ == "__main__":
    main()
