"""AOT deployment artifacts: freeze a config-specialized program to disk.

The reference has no deployment story — every run re-derives everything
from source (python-prototype/main.py edits constants in place;
bela/upmix.cpp recompiles per config).  A production serving host wants
the opposite: a version-stable artifact, built once, that the server
loads and calls without re-tracing Python.  This module provides that
via `jax.export`:

- `save_offline(path, config, n_samples)` freezes the whole-file offline
  pipeline (models/offline.py::build_offline_fn) for one padded input
  length to a single-file StableHLO artifact.
- `save_stream_step(path, config, hw_block_size)` freezes the pure
  real-time step (models/streaming.py::build_stream_step) — the
  (state, block) -> (state, lcr) function a host calls per hardware
  block.
- `save_stream_pool(path, config, hw_block_size, n_streams)` freezes
  the pallas serving-pool step (the multi-stream flagship,
  models/streaming.py::PallasStreamPool) INCLUDING its Mosaic kernel —
  the serialized StableHLO carries the tpu_custom_call payload, so a
  CPU-only build host can produce the TPU serving artifact
  (platforms defaults to ("tpu",) for this kind).
- `load(path)` restores any kind and wraps it with the same
  pad/trim/state conveniences as the live classes.

What an artifact buys: loading skips Python tracing and pins the program
bytes (StableHLO) against library drift; XLA still compiles the loaded
module once per process, and the persistent compilation cache
(utils/cache.py::enable_compilation_cache) makes THAT a disk hit too —
together a warm restart pays neither tracing nor compilation.  Artifacts
record the lowering platform(s): one exported for ("tpu",) runs on TPU
serving hosts regardless of the builder host's backend.

Format: `UPMIXAOT1\n` magic, one JSON metadata line (format version,
artifact type, the full band-resolved config, shapes, platforms, jax
version), then the `jax.export` serialization bytes verbatim.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence

import numpy as np

from upmix_tpu.config import BandSpec, UpmixConfig

_MAGIC = b"UPMIXAOT1\n"
_FORMAT = 1


# ---------------------------------------------------------------------------
# Config <-> JSON
# ---------------------------------------------------------------------------

def config_to_dict(config: UpmixConfig) -> dict:
    """JSON-safe dict carrying the FULL band-resolved config (not the
    make() inputs), so the loaded artifact reconstructs the exact bands
    it was built from even if sizing defaults drift.

    Custom analysis windows (ops.windows.register_window[_vector] /
    --window-file) are process-local registrations, so their
    coefficients ride along under "custom_windows" — without them an
    artifact or server checkpoint built with a custom window could
    never load in a fresh process (BandSpec validates window names)."""
    from upmix_tpu.ops import windows as _win

    d = dataclasses.asdict(config)
    payloads = {}
    for b in config.bands:
        if not _win.is_builtin_window(b.window) and b.window not in payloads:
            payloads[b.window] = _win.window_payload(
                b.window,
                [bb.block_size for bb in config.bands if bb.window == b.window],
            )
    if payloads:
        d["custom_windows"] = payloads
    return d


def config_from_dict(d: dict) -> UpmixConfig:
    from upmix_tpu.ops import windows as _win

    for name, payload in (d.get("custom_windows") or {}).items():
        _win.restore_window(
            name,
            payload,
            check_sizes=[
                b["block_size"] for b in d["bands"] if b["window"] == name
            ],
        )
    bands = tuple(BandSpec(**b) for b in d["bands"])
    rest = {
        k: v for k, v in d.items() if k not in ("bands", "custom_windows")
    }
    return UpmixConfig(bands=bands, **rest)


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------

def _norm_platforms(platforms: Sequence[str] | None):
    if platforms is None:
        return None
    plats = tuple(str(p).lower() for p in platforms)
    if not plats:
        raise ValueError("platforms must be None or a non-empty sequence")
    return plats


def export_offline(
    config: UpmixConfig,
    n_samples: int,
    kernel: str = "auto",
    platforms: Sequence[str] | None = None,
):
    """Export the fixed-length offline pipeline as a jax.export.Exported.

    `n_samples` is the artifact's input length; the load()ed wrapper
    zero-pads shorter inputs up to it (the same static-shape discipline as
    models/offline.py::Upmixer, whose pad_granularity plays this role for
    the live class).  `kernel` resolves HERE (resolve_kernel consults the
    builder's backend), so cross-building a TPU artifact from a CPU host
    should pass kernel="mm" explicitly.
    """
    import jax
    from jax import export as jax_export

    from upmix_tpu.models.offline import build_offline_fn, resolve_kernel

    n = int(n_samples)
    if n < 1:
        raise ValueError("n_samples must be >= 1")
    kern = resolve_kernel(kernel)
    fn = jax.jit(build_offline_fn(config, n, kern))
    spec = jax.ShapeDtypeStruct((n,), np.float32)
    return (
        jax_export.export(fn, platforms=_norm_platforms(platforms))(spec, spec),
        kern,
    )


def export_stream_step(
    config: UpmixConfig,
    hw_block_size: int,
    platforms: Sequence[str] | None = None,
):
    """Export the pure streaming step (state, [2, hw]) -> (state, [3, hw])."""
    import jax
    from jax import export as jax_export

    from upmix_tpu.models.streaming import build_stream_step, init_stream_state

    hw = int(hw_block_size)
    step = jax.jit(build_stream_step(config, hw))
    state = init_stream_state(config, hw)
    state_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state
    )
    block_spec = jax.ShapeDtypeStruct((2, hw), np.float32)
    return jax_export.export(step, platforms=_norm_platforms(platforms))(
        state_spec, block_spec
    )


def export_stream_pool(
    config: UpmixConfig,
    hw_block_size: int,
    n_streams: int,
    group: int = 16,
    layout: str = "quarters",
    ola: str = "time",
    platforms: Sequence[str] | None = ("tpu",),
    interpret: bool = False,
    hops: int = 1,
):
    """Export the pallas serving-pool step (state, [S,hw], [S,hw]) ->
    (state, (C, Ls, Rs)).

    The exported StableHLO embeds the Mosaic kernel as a versioned
    tpu_custom_call, so lowering for ("tpu",) works from ANY build
    backend — a CPU box can produce the TPU serving artifact.
    `platforms` therefore defaults to ("tpu",) here, not the current
    backend.  `interpret=True` swaps in the pure-XLA emulation of the
    kernel (CPU-runnable; testing only — a real serving host wants the
    Mosaic form).  Raises ValueError when the config is not pool-kernel
    eligible (same bar as PallasStreamPool).

    ``hops=T`` exports the temporal-batching step instead — T
    consecutive hardware blocks per launch, signature (state,
    [S, T*hw], [S, T*hw]) -> (state, (C, Ls, Rs) each [S, T*hw]);
    quarters layout only.  The loaded artifact serves through
    push_blocks_multi (its single-hop push_blocks raises — a multi-hop
    program cannot take one block).
    """
    import jax
    from jax import export as jax_export

    from upmix_tpu.models.streaming import PallasStreamPool

    # jax.jit is lazy, so constructing the pool traces/compiles nothing;
    # its jitted step is exactly the program to export.
    pool = PallasStreamPool(
        config,
        hw_block_size,
        n_streams,
        group=group,
        interpret=interpret,
        layout=layout,
        ola=ola,
    )
    hops = int(hops)
    if hops > 1:
        _, step = pool._get_multi_step(hops)
    else:
        step = pool._step
    state_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), pool.state
    )
    x_spec = jax.ShapeDtypeStruct(
        (int(n_streams), hops * int(hw_block_size)), np.float32
    )
    return jax_export.export(step, platforms=_norm_platforms(platforms))(
        state_spec, x_spec, x_spec
    )


def _write(path: str, meta: dict, payload: bytes) -> dict:
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(json.dumps(meta, sort_keys=True).encode("utf-8"))
        f.write(b"\n")
        f.write(payload)
    return meta


def save_offline(
    path: str,
    config: UpmixConfig,
    n_samples: int,
    kernel: str = "auto",
    platforms: Sequence[str] | None = None,
) -> dict:
    """Build and write an offline-pipeline artifact; returns its metadata."""
    import jax

    exported, kern = export_offline(
        config, n_samples, kernel=kernel, platforms=platforms
    )
    meta = {
        "format": _FORMAT,
        "type": "offline",
        "config": config_to_dict(config),
        "n_samples": int(n_samples),
        "kernel": kern,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return _write(path, meta, exported.serialize())


def save_stream_step(
    path: str,
    config: UpmixConfig,
    hw_block_size: int,
    platforms: Sequence[str] | None = None,
) -> dict:
    """Build and write a streaming-step artifact; returns its metadata."""
    import jax

    exported = export_stream_step(config, hw_block_size, platforms=platforms)
    meta = {
        "format": _FORMAT,
        "type": "stream_step",
        "config": config_to_dict(config),
        "hw_block_size": int(hw_block_size),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return _write(path, meta, exported.serialize())


def save_stream_pool(
    path: str,
    config: UpmixConfig,
    hw_block_size: int,
    n_streams: int,
    group: int = 16,
    layout: str = "quarters",
    ola: str = "time",
    platforms: Sequence[str] | None = ("tpu",),
    interpret: bool = False,
    hops: int = 1,
) -> dict:
    """Build and write a serving-pool artifact; returns its metadata.

    ``hops=T`` freezes the temporal-batching step (T blocks per launch;
    see export_stream_pool) — the loaded pool serves through
    push_blocks_multi only."""
    import jax

    exported = export_stream_pool(
        config,
        hw_block_size,
        n_streams,
        group=group,
        layout=layout,
        ola=ola,
        platforms=platforms,
        interpret=interpret,
        hops=hops,
    )
    meta = {
        "format": _FORMAT,
        "type": "stream_pool",
        "config": config_to_dict(config),
        "hw_block_size": int(hw_block_size),
        "n_streams": int(n_streams),
        "group": int(group),
        "layout": layout,
        "ola": ola,
        "interpret": bool(interpret),
        "hops": int(hops),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return _write(path, meta, exported.serialize())


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------

class AotOffline:
    """Loaded offline artifact: process()/process_np() like models.Upmixer,
    for inputs up to the artifact's frozen length (zero-padded up, trimmed
    back — identical semantics to Upmixer with pad_granularity=n_samples,
    minus the re-trace)."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self.config = config_from_dict(meta["config"])
        self.n_samples = int(meta["n_samples"])
        self.exported = exported

    def process(self, L, R):
        import jax.numpy as jnp

        n = len(L)
        if n < 1:
            raise ValueError("input must contain at least one sample")
        if len(R) != n:
            raise ValueError(f"channel length mismatch: {n} vs {len(R)}")
        if n > self.n_samples:
            raise ValueError(
                f"artifact is frozen at {self.n_samples} samples; got {n} "
                "(build a larger artifact or chunk the input)"
            )
        L = jnp.asarray(L, dtype=jnp.float32)
        R = jnp.asarray(R, dtype=jnp.float32)
        if n != self.n_samples:
            L = jnp.pad(L, (0, self.n_samples - n))
            R = jnp.pad(R, (0, self.n_samples - n))
        c, ls, rs = self.exported.call(L, R)
        return c[:n], ls[:n], rs[:n]

    def process_np(self, L, R):
        c, ls, rs = self.process(L, R)
        return np.asarray(c), np.asarray(ls), np.asarray(rs)


class AotStreamStep:
    """Loaded streaming-step artifact: init_state() + step(state, block),
    plus a stateful push_block convenience mirroring StreamingUpmixer
    (without donation — artifact calls go through Exported.call)."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self.config = config_from_dict(meta["config"])
        self.hw_block_size = int(meta["hw_block_size"])
        self.exported = exported
        self.state = None

    def init_state(self):
        from upmix_tpu.models.streaming import init_stream_state

        return init_stream_state(self.config, self.hw_block_size)

    def step(self, state, x_block):
        return self.exported.call(state, x_block)

    def push_block(self, in_l, in_r):
        import jax.numpy as jnp

        if self.state is None:
            self.state = self.init_state()
        x = jnp.stack(
            [jnp.asarray(in_l, jnp.float32), jnp.asarray(in_r, jnp.float32)]
        )
        if x.shape != (2, self.hw_block_size):
            raise ValueError(
                f"push_block expects two length-{self.hw_block_size} "
                f"channels; got stacked input shape {tuple(x.shape)}"
            )
        self.state, out = self.step(self.state, x)
        return out[0], out[1], out[2]


def _make_aot_stream_pool(meta: dict, exported):
    """Loaded serving-pool artifact.

    Built as a SHAPE-ONLY PallasStreamPool (no weight-matrix bake — the
    exported StableHLO embeds its own copies) whose step is the exported
    program, so push_blocks / snapshot / restore / reset_streams / reset
    are the live class's own methods (the state plumbing — quarters
    rotation, warmup counter, per-bucket OLA carries — is all inside the
    exported step).

    The exported call is re-wrapped in jax.jit, matching the live
    pool's dispatch path: bare Exported.call pays per-call Python
    overhead (measured +0.7-3 ms/block), and like the live pool the
    wrapper does NOT donate — donation measured SLOWER per dispatched
    block on v5e (scripts/bench_aot_pool.py; see PallasStreamPool's
    `donate` parameter).
    """
    import jax

    from upmix_tpu.models.streaming import PallasStreamPool

    pool = PallasStreamPool(
        config_from_dict(meta["config"]),
        int(meta["hw_block_size"]),
        int(meta["n_streams"]),
        group=int(meta["group"]),
        interpret=bool(meta.get("interpret", False)),
        layout=meta["layout"],
        ola=meta["ola"],
        _shape_only=True,
    )
    pool.meta = meta
    pool.exported = exported
    hops = int(meta.get("hops", 1))
    if hops > 1:
        # The artifact's program IS the temporal-batch step: seed the
        # multi-step cache (raw step stays None — no sustained runner on
        # AOT pools) and leave _step unset so push_blocks raises the
        # "multi-hop artifact" error instead of running a wrong shape.
        pool._multi_steps[hops] = (None, jax.jit(exported.call))
    else:
        pool._step = jax.jit(exported.call)
    return pool


def read_meta(path: str) -> dict:
    """Read just the JSON metadata line of an artifact (cheap inspection)."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an upmix_tpu AOT artifact")
        header = f.readline()
    meta = json.loads(header.decode("utf-8"))
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"{path}: unsupported artifact format {meta.get('format')!r}"
        )
    return meta


def load(path: str):
    """Load an artifact written by save_offline / save_stream_step /
    save_stream_pool (the type is read from the metadata line)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an upmix_tpu AOT artifact")
        header = f.readline()
        payload = f.read()
    meta = json.loads(header.decode("utf-8"))
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"{path}: unsupported artifact format {meta.get('format')!r}"
        )
    exported = jax_export.deserialize(payload)
    if meta["type"] == "offline":
        return AotOffline(meta, exported)
    if meta["type"] == "stream_step":
        return AotStreamStep(meta, exported)
    if meta["type"] == "stream_pool":
        return _make_aot_stream_pool(meta, exported)
    raise ValueError(f"{path}: unknown artifact type {meta['type']!r}")
