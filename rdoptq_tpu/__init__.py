"""rdoptq_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for rate-distortion
optimized post-training quantization of learned image compression models.

Brand-new design with the capabilities of the reference RDO-PTQ codebase
(Shi, Lu, Ma — "Rate-Distortion Optimized Post-Training Quantization for
Learned Image Compression", IEEE TCSVT 2023). Everything here is written
TPU-first: pure-functional models over parameter pytrees, quantization as a
pytree transformation, calibration loops as jitted `lax.scan` bodies,
channel-wise quantizer search batched with `vmap`, data-parallel evaluation
with `jax.sharding`, and a host-side C++ rANS range coder for the actual
bitstream.

Package layout
--------------
- ``ops``      core math: quantizers, AdaRound, entropy models, GDN, metrics
- ``models``   LIC model zoo (Minnen2018, Cheng2020, Lu2022/NIC, TinyLIC)
- ``quant``    model surgery + calibration engines (light uniform & RDO)
- ``coding``   host-side rANS range coder + CDF quantization (C++)
- ``eval``     dataset harnesses (Kodak/Tecnick/CLIC), BD-rate
- ``parallel`` device mesh and sharding helpers
- ``utils``    config, logging, checkpointing
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache: TPU compiles of the full models
    are expensive (minutes over a remote-compile tunnel); caching them
    makes every process after the first start hot."""
    import os
    try:
        import jax
        path = os.environ.get("RDOPTQ_JAX_CACHE",
                              os.path.expanduser("~/.cache/rdoptq_jax"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _platform_override():
    """``RDOPTQ_PLATFORM=cpu`` forces the JAX platform. Needed because the
    environment presets ``JAX_PLATFORMS`` before Python starts, so the
    standard env var cannot be overridden from a shell — this gives CLIs
    and scripts a working escape (e.g. run a smoke test on CPU while the
    single TPU chip is busy)."""
    import os
    plat = os.environ.get("RDOPTQ_PLATFORM")
    if plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover
            pass


_enable_compile_cache()
_platform_override()
