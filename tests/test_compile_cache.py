"""The persistent-compile-cache gate (fdt.utils.cache).

The cache is load-bearing for TPU CLIs (bench.py, train_pyramid.py, serve.py)
but must never activate on the CPU backend: reloading XLA:CPU AOT
executables on this host trips a CPU-feature mismatch that can hang the
process (NOTES.md round-2 finding).  The suite runs CPU-pinned, so the gate
must refuse here.
"""
import jax

from fdt.utils.cache import enable_tpu_compile_cache


def test_gate_refuses_cpu_backend(tmp_path):
    assert jax.default_backend() == "cpu"  # conftest pins the suite to CPU
    cache_dir = str(tmp_path / "xla_cache")
    assert enable_tpu_compile_cache(cache_dir) is False
    # and it must not have touched the config on the refused path
    assert jax.config.jax_compilation_cache_dir != cache_dir


def test_gate_never_raises(monkeypatch, tmp_path):
    # a broken backend probe must cost compile time only, never the caller
    monkeypatch.setattr(jax, "default_backend",
                        lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert enable_tpu_compile_cache(str(tmp_path)) is False
