"""Video inputs: utils (smart resize, sampling, frame loading), full-model
HF parity with video pixels for Qwen3-VL and Qwen2.5-VL (incl.
second_per_grid_ts temporal rope), served end-to-end with a video part, and
LFM2-VL image tiling."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from aha_tpu.utils.video import (
    load_video_frames,
    sample_frames,
    video_smart_resize,
    video_timestamps,
)


# ---------------------------------------------------------------------------
# Utils
# ---------------------------------------------------------------------------


def test_video_smart_resize_budget():
    # pixel budget counted across frames (video_utils.rs:42-58)
    h, w = video_smart_resize(8, 300, 400, 2, 28, 56 * 56, 100 * 28 * 28)
    assert h % 28 == 0 and w % 28 == 0
    assert 8 * h * w <= 8 * 300 * 400  # shrunk
    t_bar = 8
    assert t_bar * h * w <= 100 * 28 * 28 * 1.1
    with pytest.raises(ValueError):
        video_smart_resize(1, 300, 400, 2, 28, 0, 10 ** 9)


def test_sample_frames_clamps():
    frames = np.zeros((100, 8, 8, 3), np.uint8)
    out, idx, fps = sample_frames(frames, src_fps=25.0, target_fps=2.0,
                                  min_frames=4, max_frames=16)
    # 4 s video at 2 fps → 8 frames
    assert 4 <= out.shape[0] <= 16
    assert idx[0] == 0 and np.all(np.diff(idx) > 0)
    out2, _, _ = sample_frames(frames, 25.0, 2.0, 4, 6)
    assert out2.shape[0] <= 6 + 1  # interval rounding can add one


def test_load_video_frames_npz_and_gif(tmp_path):
    import base64
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 16, 20, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, fps=4.0)
    url = "data:application/npz;base64," + base64.b64encode(
        buf.getvalue()).decode()
    got, fps = load_video_frames(url)
    np.testing.assert_array_equal(got, frames)
    assert fps == 4.0

    gif = tmp_path / "clip.gif"
    imgs = [Image.fromarray(frames[i]) for i in range(5)]
    imgs[0].save(gif, save_all=True, append_images=imgs[1:], duration=250)
    got, fps = load_video_frames(str(gif))
    assert got.shape == (5, 16, 20, 3)
    assert abs(fps - 4.0) < 1e-6


def test_video_timestamps_midpoints():
    stamps = video_timestamps(np.array([0, 10, 20, 30]), fps=10.0,
                              t_merge_size=2)
    assert stamps == [0.5, 2.5]
    # odd count pads with the last index
    stamps = video_timestamps(np.array([0, 10, 20]), fps=10.0,
                              t_merge_size=2)
    assert stamps == [0.5, 2.0]


# ---------------------------------------------------------------------------
# Qwen3-VL / Qwen2.5-VL model parity with video pixels
# ---------------------------------------------------------------------------


def _video_prompt(grid, vid_tok, vstart):
    t, h, w = grid
    n_units = t * (h // 2) * (w // 2)
    return [1, 2, vstart] + [vid_tok] * n_units + [3, 4, 5]


def test_qwen3vl_video_parity_with_hf():
    torch = pytest.importorskip("torch")
    from tests.test_qwen3vl import IMG_TOK, TINY, VID_TOK, VSTART, _hf_tiny

    from aha_tpu.io.weights import DictSource
    from aha_tpu.models.qwen3vl import (
        Qwen3VLModel,
        get_rope_index_qwen3vl,
        vision_geometry_qwen3vl,
    )

    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = Qwen3VLModel(TINY, max_rope_len=256)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    # timestamped structure: each frame its own vision block (HF qwen3_vl
    # repeat_interleaves the video grid to per-frame (1, h, w) entries)
    grid = (2, 4, 4)  # 2 temporal groups
    n_units_frame = (grid[1] // 2) * (grid[2] // 2)
    ids = ([1, 2]
           + [VSTART] + [VID_TOK] * n_units_frame + [5]
           + [VSTART] + [VID_TOK] * n_units_frame + [5]
           + [3, 4])
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((n_patches, 3 * 2 * 16 * 16)).astype(
        np.float32)
    frame_grids = [(1, grid[1], grid[2])] * grid[0]
    geo = vision_geometry_qwen3vl(frame_grids, TINY.vision)
    pos, delta = get_rope_index_qwen3vl(ids, frame_grids, TINY)
    mm = {"patches": jnp.asarray(patches),
          **{k: jnp.asarray(v) for k, v in geo.items()},
          "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values_videos=torch.tensor(patches),
                 video_grid_thw=torch.tensor([grid])).logits.numpy()[0]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_qwen2_5vl_video_parity_with_hf():
    torch = pytest.importorskip("torch")
    from tests.test_qwen2_5vl import TINY, VID_TOK, VSTART, _hf_tiny

    from aha_tpu.io.weights import DictSource
    from aha_tpu.models.qwen2_5vl import (
        Qwen2_5VLModel,
        get_rope_index,
        vision_geometry,
    )

    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = Qwen2_5VLModel(TINY, max_rope_len=256)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grid = (2, 4, 4)
    spg = [1.5]  # second_per_grid_ts
    ids = _video_prompt(grid, VID_TOK, VSTART)
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((n_patches, 3 * 2 * 14 * 14)).astype(
        np.float32)

    # rope index parity first (temporal interval path)
    with torch.no_grad():
        ref_pos, ref_delta = hf.model.get_rope_index(
            torch.tensor([ids]), video_grid_thw=torch.tensor([grid]),
            second_per_grid_ts=torch.tensor(spg))
    pos, delta = get_rope_index(ids, [grid], TINY, second_per_grid_ts=spg)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])

    geo = vision_geometry([grid], TINY.vision)
    n_units = n_patches // 4
    mm = {"patches": jnp.asarray(patches),
          "window_index": jnp.asarray(geo["window_index"]),
          "inverse_index": jnp.asarray(geo["inverse_index"]),
          "window_seg": jnp.asarray(geo["window_seg"]),
          "full_seg": jnp.asarray(geo["full_seg"]),
          "pos_hw": jnp.asarray(geo["pos_hw"]),
          "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values_videos=torch.tensor(patches),
                 video_grid_thw=torch.tensor([grid]),
                 second_per_grid_ts=torch.tensor(spg)).logits.numpy()[0]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, ref, atol=2e-2)


# ---------------------------------------------------------------------------
# Served end-to-end with a video part
# ---------------------------------------------------------------------------


def _npz_video_url(t=8, h=64, w=64, fps=2.0, seed=0):
    import base64
    import io

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, fps=fps)
    return ("data:application/npz;base64,"
            + base64.b64encode(buf.getvalue()).decode())


def test_served_qwen3vl_video(tmp_path_factory):
    from tests.test_qwen3vl_served import vl3_repo  # noqa: F401  (fixture)

    pytest.importorskip("torch")
    # build the repo inline (the fixture is module-scoped elsewhere)
    import tests.test_qwen3vl_served as base

    repo = base.vl3_repo.__wrapped__(tmp_path_factory)
    # template: add video part rendering
    with open(os.path.join(repo, "tokenizer_config.json")) as f:
        tpl = json.load(f)["chat_template"]
    tpl = tpl.replace(
        "{% elif part.type == 'image_url' %}"
        "<|vision_start|><|image_pad|><|vision_end|>",
        "{% elif part.type == 'image_url' %}"
        "<|vision_start|><|image_pad|><|vision_end|>"
        "{% elif part.type == 'video_url' %}"
        "<|vision_start|><|video_pad|><|vision_end|>")
    with open(os.path.join(repo, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": tpl}, f)

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    served = load_model("Qwen/Qwen3-VL-2B-Instruct", repo)
    mes = ChatCompletionParameters.model_validate({
        "model": "q", "messages": [{"role": "user", "content": [
            {"type": "video_url", "video_url": {"url": _npz_video_url()}},
            {"type": "text", "text": "Describe the clip."}]}],
        "max_tokens": 4, "temperature": 0.0})
    data = served.get_data(mes)
    vid_id = served.vl_model.config.video_token_id
    n_vid = data.input_ids.count(vid_id)
    assert n_vid > 0 and data.mm is not None
    # timestamps rendered into the prompt
    text = served.tokenizer.decode(data.input_ids, skip_special_tokens=True)
    assert "seconds>" in text
    resp = served.generate(mes)
    assert resp.usage.prompt_tokens == len(data.input_ids)
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content


# ---------------------------------------------------------------------------
# LFM2-VL tiling
# ---------------------------------------------------------------------------


def test_lfm2vl_tiling_token_accounting(tmp_path_factory):
    pytest.importorskip("torch")
    import tests.test_lfm2vl as base

    repo = base.lfm2vl_repo.__wrapped__(tmp_path_factory)
    # enable splitting with a small budget so a big image tiles
    with open(os.path.join(repo, "preprocessor_config.json"), "w") as f:
        json.dump({"do_image_splitting": True, "tile_size": 64,
                   "min_tiles": 2, "max_tiles": 4, "use_thumbnail": True,
                   "max_pixels_tolerance": 1.0}, f)

    import base64
    import io

    from PIL import Image

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    served = load_model("LiquidAI/LFM2-VL-1.6B", repo)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (300, 600, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    mes = ChatCompletionParameters.model_validate({
        "model": "l", "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": "Hi."}]}],
        "max_tokens": 3, "temperature": 0.0})
    data = served.get_data(mes)
    text = served.tokenizer.decode(data.input_ids, skip_special_tokens=True)
    assert "<|img_row_1_col_1|>" in text
    assert "<|img_thumbnail|>" in text
    # image token count == tiles·tokens_per_tile + thumbnail tokens
    c = served.vl_model.config
    f = c.downsample_factor
    ps = c.vision.patch_size
    tile_units = (64 // ps // f) ** 2
    img_tok = served.tokenizer.token_to_id("<image>")
    n_img = data.input_ids.count(img_tok)
    n_tiles = int(np.asarray(data.mm["pixels"]).shape[0]) - 1  # minus thumb
    assert n_img > n_tiles * tile_units  # tiles + thumbnail
    resp = served.generate(mes)
    assert resp.usage.prompt_tokens == len(data.input_ids)


def test_container_sniffing():
    from aha_tpu.utils.video import _is_video_container

    assert _is_video_container(b"\x00\x00\x00\x18ftypisom" + b"\0" * 8) == "mp4"
    assert _is_video_container(b"\x1a\x45\xdf\xa3" + b"\0" * 16) == "webm/mkv"
    assert _is_video_container(b"RIFF\x00\x00\x00\x00AVI " + b"\0" * 8) == "avi"
    assert _is_video_container(b"\x93NUMPY" + b"\0" * 16) is None
    assert _is_video_container(b"\x89PNG\r\n\x1a\n" + b"\0" * 8) is None


def test_mp4_without_decoder_raises_clean_error():
    """Mirrors the reference's off-by-default ffmpeg feature: with no
    decoder installed, a real container input fails with an actionable
    message instead of a PIL decode traceback."""
    from aha_tpu.utils.video import _frames_from_bytes

    data = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    try:
        import av  # noqa: F401
        pytest.skip("PyAV installed: the decode path applies instead")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="mp4 video.*decoder"):
        _frames_from_bytes(data)


def test_mp4_decodes_through_stub_pyav(monkeypatch):
    """With a PyAV-shaped module present, container bytes decode to
    (T, H, W, 3) frames + fps."""
    import sys
    import types

    frames = [np.full((8, 6, 3), i, np.uint8) for i in range(4)]

    class _Stream:
        average_rate = 12.5

    class _Frame:
        def __init__(self, a):
            self._a = a

        def to_ndarray(self, format):
            assert format == "rgb24"
            return self._a

    class _Container:
        streams = types.SimpleNamespace(video=[_Stream()])

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, stream):
            return [_Frame(a) for a in frames]

    fake = types.ModuleType("av")
    fake.open = lambda fh: _Container()
    monkeypatch.setitem(sys.modules, "av", fake)

    from aha_tpu.utils.video import _frames_from_bytes

    got, fps = _frames_from_bytes(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)
    assert got.shape == (4, 8, 6, 3) and fps == 12.5
    assert (got[2] == 2).all()
