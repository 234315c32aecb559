"""Test environment: CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware.

The container injects an axon TPU plugin via a PYTHONPATH sitecustomize which
registers the backend at interpreter start — before any conftest runs — and
pins JAX_PLATFORMS=axon with a single CPU device.  To get a clean 8-device
CPU environment we re-exec pytest once with that path stripped and CPU flags
forced.  The re-exec happens in pytest_configure (after stopping pytest's
global capture, which otherwise swallows the new process's stdout).
"""

import os
import sys

_MARK = "AHA_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return ("axon_site" in pythonpath
            or os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"))


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("AHA_DTYPE", "float32")
    # true-f32 matmuls on CPU: the default silently downcasts to bf16-level
    # precision, which masks real numerics bugs in parity tests
    env.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
    # persistent compile cache: recompiles dominate suite wall time
    env.setdefault("AHA_COMPILE_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    # re-exec via -m pytest (running argv[0]=…/pytest/__main__.py directly
    # would put the pytest package dir on sys.path[0] and shadow the import)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("AHA_DTYPE", "float32")
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
os.environ.setdefault("AHA_COMPILE_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m "not slow"` is the quick gate (~2 min); the
# heavy HF-parity and end-to-end model files are marked slow from measured
# durations (full suite ~21 min on this class of machine).
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_asr", "test_blocks", "test_campplus", "test_deepseek_ocr",
    "test_fire_red_vad", "test_flash_attention", "test_fun_asr",
    "test_gguf", "test_glm_asr", "test_glm_hunyuan_ocr",
    "test_integration_qwen3", "test_lfm2vl", "test_llama_lfm2",
    "test_minilm", "test_moss_codec", "test_moss_tts", "test_paddleocr_vl",
    "test_parallel", "test_qwen2_5vl", "test_qwen2_5vl_served",
    "test_qwen3_5", "test_qwen3_5_served", "test_qwen3_model",
    "test_qwen3vl", "test_qwen3vl_served", "test_rmbg", "test_video",
    "test_voxcpm", "test_w2v_bert",
}
# individually heavy tests inside otherwise-fast modules
_SLOW_TESTS = {
    "test_run_rmbg_writes_png", "test_run_asr_with_wav",
    "test_run_text_and_output_flags",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        if mod in _SLOW_MODULES or item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
