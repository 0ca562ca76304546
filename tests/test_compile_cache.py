"""Persistent XLA compilation cache (ssd_tpu/utils/compile_cache.py)."""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys, time
from ssd_tpu.utils.compile_cache import enable_compile_cache
d = enable_compile_cache(sys.argv[1])
assert d == sys.argv[1], d
import jax, jax.numpy as jnp

@jax.jit
def f(x):
    for _ in range(20):
        x = jnp.tanh(x @ x) + 1.0
    return x

t0 = time.time()
f(jnp.ones((256, 256), jnp.float32)).block_until_ready()
print("ELAPSED", time.time() - t0)
"""


def _run_child(cache_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, "-c", CHILD, cache_dir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise AssertionError(out.stdout + out.stderr)


def test_cache_populates_and_hits(tmp_path):
    cache_dir = str(tmp_path / "xla")
    _run_child(cache_dir)
    entries = os.listdir(cache_dir)
    assert entries, "first run wrote no cache entries"
    mtimes = {e: os.path.getmtime(os.path.join(cache_dir, e))
              for e in entries}
    time.sleep(0.05)
    _run_child(cache_dir)
    # Second process must reuse (not rewrite) the main program's entry.
    entries2 = os.listdir(cache_dir)
    assert set(entries2) >= set(entries)
    for e in entries:
        assert os.path.getmtime(os.path.join(cache_dir, e)) == mtimes[e], (
            f"cache entry {e} was rewritten on the second run (cache miss)")


def test_disable_via_env(monkeypatch):
    import ssd_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("SSD_TPU_COMPILE_CACHE", "0")
    assert cc.enable_compile_cache() is None


def test_pure_cpu_defaults_off(monkeypatch):
    import ssd_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.delenv("SSD_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert cc.enable_compile_cache() is None


def test_explicit_arg_beats_env(tmp_path, monkeypatch):
    import jax

    import ssd_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("SSD_TPU_COMPILE_CACHE", "0")
    d = str(tmp_path / "explicit")
    try:
        assert cc.enable_compile_cache(d) == d
        assert os.path.isdir(d)
    finally:
        # Don't leave the suite's jax pointed at a soon-deleted tmp dir.
        jax.config.update("jax_compilation_cache_dir", None)
        cc._enabled_dir = None
