"""Persistent compilation cache wiring (utils/compcache.py).

Fresh-process demo cold start is compile-dominated (200+ s through the
bench tunnel — bench_details.json: demo_coldstart), so the demo CLIs
enable JAX's persistent compilation cache by default and traineval gets
it via --compilation_cache.  These tests pin the env resolution and that
a jit compile actually lands entries in the directory.
"""

import os

import pytest

pytestmark = pytest.mark.fast


@pytest.fixture
def restore_cache_config():
    import jax

    prev = {
        name: getattr(jax.config, name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    yield
    for name, value in prev.items():
        jax.config.update(name, value)


def test_disabled_via_env(monkeypatch):
    from obman_train_tpu.utils.compcache import enable_persistent_cache

    monkeypatch.setenv("OBMAN_COMPCACHE", "0")
    assert enable_persistent_cache() is None


def test_env_dir_resolution(tmp_path, monkeypatch, restore_cache_config):
    from obman_train_tpu.utils.compcache import enable_persistent_cache

    monkeypatch.delenv("OBMAN_COMPCACHE", raising=False)
    monkeypatch.setenv("OBMAN_COMPCACHE_DIR", str(tmp_path / "envdir"))
    assert enable_persistent_cache() == str(tmp_path / "envdir")
    # explicit argument wins over the env var
    assert enable_persistent_cache(str(tmp_path / "arg")) == str(
        tmp_path / "arg"
    )


def test_compile_populates_cache(tmp_path, monkeypatch, restore_cache_config):
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.utils.compcache import enable_persistent_cache

    monkeypatch.delenv("OBMAN_COMPCACHE", raising=False)
    monkeypatch.delenv("OBMAN_COMPCACHE_DIR", raising=False)
    cache = str(tmp_path / "cache")
    assert enable_persistent_cache(cache) == cache

    @jax.jit
    def f(x):  # constants make the HLO unique to this test
        return x * 3.25 + 41.5

    f(jnp.arange(7, dtype=jnp.float32)).block_until_ready()
    assert os.path.isdir(cache)
    assert len(os.listdir(cache)) > 0, (
        "persistent compilation cache wrote no entries "
        "(min-compile-time/min-entry-size thresholds not lowered?)"
    )


def test_traineval_flag_exists():
    from obman_train_tpu.cli.traineval import build_parser

    args = build_parser().parse_args(
        ["--compilation_cache", "--exp_id", "x"]
    )
    assert args.compilation_cache is True
