"""Persistent XLA compile cache (detjax/utils/cache.py).

Subprocess-isolated: the cache is process-global jax config, and the test
suite already points it at /tmp/jax_test_cache (conftest) — so the
behavior under test (fresh process → cache write; restarted process →
cache hit, no rewrite) runs in child interpreters against a tmp dir.
"""

import argparse
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Mirrors conftest: the box's sitecustomize force-sets jax_platforms to
# "axon,cpu", so the child must override it back before any compile.
_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from detjax.utils.cache import enable_compile_cache, host_fingerprint
d = enable_compile_cache(sys.argv[1])
# host-scoped subdir: foreign XLA:CPU AOT entries crash, not miss
assert d == os.path.join(os.path.abspath(sys.argv[1]),
                         "host-" + host_fingerprint()), d
import jax.numpy as jnp
out = jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))
print("RESULT", float(out))
"""


def _run_child(cache_dir):
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cache_dir)],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RESULT 262144.0" in proc.stdout, proc.stdout
    return proc


def test_cache_written_then_hit_across_process_restart(tmp_path):
    cache = tmp_path / "xla"
    _run_child(cache)
    files = [p for p in cache.rglob("*") if p.is_file()]
    assert files, "first process wrote no cache entries"
    snapshot = {p: p.stat().st_mtime_ns for p in files}

    _run_child(cache)  # the "restarted server": must hit, not recompile
    files2 = [p for p in cache.rglob("*") if p.is_file()]
    assert {p: p.stat().st_mtime_ns for p in files2} == snapshot, (
        "restart re-wrote cache entries — the compile was not a cache hit")


def test_flag_plumbing_parses_without_touching_jax():
    from detjax.utils.cache import (DEFAULT_DIR, add_compile_cache_flag,
                                    apply_compile_cache_flag)

    ap = argparse.ArgumentParser()
    add_compile_cache_flag(ap)
    assert ap.parse_args([]).compile_cache is None
    # bare flag → sentinel "" so enable_compile_cache resolves
    # env-var-then-DEFAULT_DIR in one place (ADVICE r3) — same precedence
    # as serve's default-on path
    assert ap.parse_args(["--compile-cache"]).compile_cache == ""
    assert ap.parse_args(
        ["--compile-cache", "/x"]).compile_cache == "/x"
    # no flag + not default-on → no jax config mutation (returns early)
    assert apply_compile_cache_flag(ap.parse_args([])) is None
    assert DEFAULT_DIR  # still exported for help text / library callers

    ap2 = argparse.ArgumentParser()
    add_compile_cache_flag(ap2, default_on=True)
    args = ap2.parse_args(["--no-compile-cache"])
    assert apply_compile_cache_flag(args, default_on=True) is None


def test_host_fingerprint_stable_and_feature_sensitive():
    """The fingerprint is deterministic within a host and ties to the CPU
    feature flags — the exact axis along which foreign XLA:CPU AOT cache
    entries are unsafe (SIGILL class, not a cache miss)."""
    from detjax.utils.cache import host_fingerprint

    a, b = host_fingerprint(), host_fingerprint()
    assert a == b and len(a) == 12
    int(a, 16)  # hex


def test_env_var_fallback(tmp_path, monkeypatch):
    # enable_compile_cache() with no dir honors DETJAX_COMPILE_CACHE; use a
    # child process so the session's jax config stays untouched.
    child = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from detjax.utils.cache import enable_compile_cache, host_fingerprint
d = enable_compile_cache()
assert d == os.path.join(os.environ["DETJAX_COMPILE_CACHE"],
                         "host-" + host_fingerprint()), d
assert jax.config.jax_compilation_cache_dir == d
print("ENV OK")
"""
    env = dict(os.environ)
    env["DETJAX_COMPILE_CACHE"] = str(tmp_path / "envcache")
    proc = subprocess.run([sys.executable, "-c", child],
                          capture_output=True, text=True, cwd=REPO,
                          env=env, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ENV OK" in proc.stdout
