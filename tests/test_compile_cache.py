"""Persistent XLA compilation cache plumbing (utils/compile_cache.py)."""
import os
import subprocess
import sys


def test_enable_and_populate(tmp_path):
    # Fresh process: in-suite, earlier tests have already initialized the
    # XLA disk cache at the default dir (CLIs enable it via the parser),
    # and a mid-process jax_compilation_cache_dir update doesn't reliably
    # re-point the already-constructed cache object.
    cache_dir = str(tmp_path / "xla")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from mdm_tpu.utils.compile_cache import enable_compile_cache\n"
        f"assert enable_compile_cache() == {cache_dir!r}\n"
        f"assert enable_compile_cache() == {cache_dir!r}  # idempotent\n"
        "import jax.numpy as jnp\n"
        "jax.jit(lambda x: x * 3 + 1)(jnp.ones(8))\n"
    )
    env = dict(os.environ, MDM_TPU_COMPILE_CACHE=cache_dir)
    subprocess.run(
        [sys.executable, "-c", code],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert os.listdir(cache_dir), "cache dir should hold compiled entries"


def test_opt_out(monkeypatch):
    import mdm_tpu.utils.compile_cache as cc

    monkeypatch.setenv("MDM_TPU_COMPILE_CACHE", "0")
    monkeypatch.setattr(cc, "_enabled_dir", None)
    assert cc.enable_compile_cache() is None
