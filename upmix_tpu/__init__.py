"""upmix_tpu — TPU-native multi-band stereo→LCR upmix framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
willleskowitz/upmix reference (stereo→LCR center extraction via multi-band
WOLA STFT processing; see SURVEY.md).  The compute path is TPU-first:
frames-as-tensors, batched FFTs, fused elementwise masking vmapped over
bands, overlap-add as a static pad-sum fold, scan-based streaming, and
mesh-sharded batch/long-input execution.

Public surface:
  - config: UpmixConfig / BandSpec / chain_bands — band plumbing and sizing
  - models.offline: Upmixer — whole-file offline pipeline (the flagship path)
  - models.streaming: StreamingUpmixer — block-based real-time engine;
    BatchStreamingUpmixer — multi-stream serving pool (vmapped step);
    PallasStreamPool / make_stream_pool — single-launch pallas serving
    pool (~6x the vmapped pool's capacity on TPU when eligible)
  - io.wav: read_wav / write_wav — pure-NumPy WAV I/O
  - oracle: faithful NumPy re-derivation of the reference semantics (test oracle)
  - aot: jax.export deployment artifacts — freeze a config-specialized
    offline pipeline or streaming step to a version-stable file a serving
    host loads without re-tracing
  - serve_stream: multi-client TCP stream server (StreamServer,
    stream_client, fetch_metrics) with checkpoint/resume + metrics
  - metrics: serving observability (latency histograms, Prometheus text)
  - tune: on-device serving-pool autotuner (tune_pool)
"""

from upmix_tpu.config import (
    EPS,
    BandSpec,
    UpmixConfig,
    chain_bands,
    compute_block_size_for_low_freq,
    freq_to_bin,
    hp_freq_to_crossover_width,
    next_power_of_2,
    streaming_stft_table,
)

__version__ = "0.2.0"

__all__ = [
    "EPS",
    "BandSpec",
    "UpmixConfig",
    "chain_bands",
    "compute_block_size_for_low_freq",
    "freq_to_bin",
    "hp_freq_to_crossover_width",
    "next_power_of_2",
    "streaming_stft_table",
    "__version__",
]


def __getattr__(name):
    # Lazy heavyweight surfaces (importing them pulls in jax program
    # construction; keep bare `import upmix_tpu` light).
    if name in ("Upmixer", "upmix_offline", "StreamingUpmixer",
                "BatchStreamingUpmixer", "PallasStreamPool",
                "make_stream_pool"):
        import upmix_tpu.models as _m

        return getattr(_m, name)
    if name == "BatchUpmixer":
        from upmix_tpu.models.batch import BatchUpmixer

        return BatchUpmixer
    if name == "ShardedUpmixer":
        from upmix_tpu.parallel import ShardedUpmixer

        return ShardedUpmixer
    if name in ("run_offline", "run_streaming", "run_pipe", "run_jobs"):
        import upmix_tpu.app as _a

        return getattr(_a, name)
    raise AttributeError(f"module 'upmix_tpu' has no attribute {name!r}")
