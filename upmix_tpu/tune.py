"""On-device serving-pool autotuner.

The serving capacity of a pool depends on two knobs with hardware-
specific optima: the stream-batch size B (v5e measured: capacity peaks
at B≈4096 for the quarters pallas pool, B≈2048 for the window layout)
and the pallas kernel's streams-per-grid-step G (measured optimum 16;
32 ≈9% worse, 64 fails to compile).  Those numbers were found by hand
with the interleaved min-of-visits protocol (DESIGN.md §6); this module
packages that protocol as a framework feature so a deployment on NEW
hardware can re-derive its own optimum instead of inheriting v5e's.

    from upmix_tpu.tune import tune_pool
    report = tune_pool(config, hw_block, batch_sizes=(1024, 2048, 4096))
    best = report["best"]          # {"batch": ..., "group": ..., ...}

or from the shell:

    python -m upmix_tpu.tune --sr 48000 --hw-block 2048 \
        --batches 1024,2048,4096 --groups 8,16

Protocol notes (hard-won, see CLAUDE.md):
- Candidates are visited ROUND-ROBIN and each keeps the MIN over
  visits: transport/scheduler noise arrives in multi-second bursts, so
  sequential per-candidate timing misattributes a burst to whichever
  candidate it lands on.
- Each visit times `blocks` chained `push_blocks` calls with device-
  resident inputs (uploaded ONCE per candidate, outside the clock) and
  ONE tiny scalar fetch at the end: the pool's carried state
  dependency-chains the steps, so the fetch bounds the whole chain
  without pulling block inputs/outputs through a slow transport.
- A candidate that fails to build or compile (e.g. Mosaic rejecting a
  large G) is recorded with its error and excluded from `best` — the
  tuner's job includes mapping the feasible region.
- The report carries `transport_floor_seconds` (min trivial
  dispatch+fetch time): on a direct-attach host it is ~0.1 ms and the
  per-block numbers are chip capacity; on a remote tunnel each
  push_blocks dispatch pays the RTT, so when the floor approaches the
  per-block time the ABSOLUTE capacity is transport-gated (a lower
  bound) while same-batch candidate comparisons remain valid.
- `protocol="scan"` sidesteps the RTT entirely: each visit runs
  `blocks` steps dependency-chained in ONE compiled program
  (make_sustained_runner) with a single scalar fetch, so chip-side
  capacity — and the G ordering — resolves even on a link whose RTT
  exceeds the per-block time.  The one remaining transport cost (one
  RTT per visit) is an additive constant shared by every candidate;
  raise `blocks` (48 is comfortable) to shrink it below the noise.
- `protocol="lockstep"` deliberately puts the transfers BACK in the
  timed region: host inputs in, a full host fetch of all three outputs
  per cycle — the stream server's lockstep dispatcher cycle
  (serve_stream.py), where outputs must reach client sockets before the
  next dispatch.  This is the protocol that resolves the temporal-
  batching knob: hops=T divides the per-cycle RTT + fetch overhead by T
  (measured 2.5x aggregate at T=4 on the multi-process serving stack,
  BASELINE.md) while the async-pipelined "dispatch" protocol reads it
  as a wash.  Size the sweep to the link: each cycle moves
  ~5*B*T*hw*4 bytes, so tune at the deployment's REAL stream count.

`tune_offline` (CLI: `--offline`) applies the same protocol to the
offline pipeline's one device-specific knob, the scan chunk size
(models/offline.py CHUNK_SAMPLES = the v5e optimum): `inner`
applications dependency-chained in one dispatch per visit, min over
interleaved visits, best by realtime factor.

The reference has no analog (its one tunable, threshold_factor, is a
quality knob); this is TPU-framework machinery like XLA's own
autotuning, applied to the serving layer.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["tune_pool", "tune_offline"]


def _build_candidate(config, hw_block, batch, engine, group, layout, ola):
    from upmix_tpu.models.streaming import make_stream_pool

    return make_stream_pool(
        config, hw_block, batch, engine=engine, group=group,
        layout=layout, ola=ola,
    )


def tune_pool(
    config,
    hw_block: int,
    batch_sizes=(512, 1024, 2048, 4096),
    groups=(8, 16, 32),
    engine: str = "pallas",
    layout: str = "quarters",
    ola: str = "time",
    blocks: int = 16,
    visits: int = 3,
    include_xla: bool = False,
    protocol: str = "dispatch",
    unroll: int = 8,
    hops=(1,),
    pipelines=(1,),
    verbose: bool = True,
) -> dict:
    """Sweep (batch, group) serving-pool candidates on the attached
    device; return per-candidate timings and the capacity-best choice.

    Capacity model: a pool serving B streams at `t` seconds per block
    sustains `B * (hw_block / sr) / t` realtime streams per chip.

    Two measurement protocols (``protocol=``):

    - ``"dispatch"`` (default): times the sustained `push_blocks` path
      — the deployment dispatch surface, donation policy and per-block
      host overhead included.  On a direct-attach host this IS serving
      capacity; through a high-RTT transport every block pays the round
      trip, so the sweep measures the link and cannot resolve chip-side
      knobs like G (round-3 on-chip validation: floor 28.8 ms vs 45-52
      ms/block candidates).
    - ``"scan"``: times `make_sustained_runner` — `blocks` steps
      dependency-chained inside ONE compiled program per visit, one
      scalar fetch at the end.  Transport cost is paid once per visit
      instead of once per block, so chip-side capacity (the BASELINE.md
      protocol) resolves even through the dev tunnel.  `unroll` steps
      run per scan iteration (the quarters layout needs >1 to keep its
      rotation off the scan back-edge).  Host-side per-block costs are
      EXCLUDED — use "dispatch" to budget a host-attached deployment's
      end-to-end block cycle.
    - ``"lockstep"``: times the full serving cycle — HOST input arrays
      pushed, then all three outputs fetched to host before the next
      cycle, exactly the stream server's lockstep dispatcher
      (serve_stream.py: np.stack'd blocks in, np.asarray(c/ls/rs) out
      to the socket writers).  Unlike "dispatch", the transfers belong
      in the clock here; this is the protocol that resolves the
      ``hops`` knob on RTT- or bandwidth-gated links.

    ``include_xla=True`` adds one BatchStreamingUpmixer candidate per
    batch size (group is a pallas-only knob), so the report shows the
    engine crossover too.

    ``hops`` sweeps temporal batching depth: a candidate at hops=T runs
    T consecutive hardware blocks per kernel launch
    (PallasStreamPool.push_blocks_multi / make_sustained_runner(hops=T)
    — quarters layout only; the serving trade is T block deadlines of
    input latency per dispatch).  T values that don't divide ``blocks``
    are skipped; engines/layouts without multi-hop support record the
    rejection like any other infeasible candidate.

    ``pipelines`` sweeps the serving dispatcher's pipelined-dispatch
    depth (lockstep protocol only — the other protocols are already
    async-pipelined by jax dispatch): a candidate at pipeline=2 parks
    each cycle's device outputs and fetches them AFTER dispatching the
    next cycle, overlapping the host fetch with the chip compute —
    StreamServer(pipeline=2)'s cost model.  The win is bounded by
    min(chip compute, host fetch) per cycle, so it resolves only where
    both are material.  Memory note: the
    scan protocol keeps one device-resident input slab alive per
    (batch, T) pair for the interleaved visits — size the sweep to HBM
    (each slab is blocks*2*batch*hw_block*4 bytes).  Returns::

        {"results": [...], "best": {...} | None,
         "protocol": {"blocks": ..., "visits": ...}}
    """
    hw_block = int(hw_block)
    block_seconds = hw_block / float(config.sr)
    if protocol not in ("dispatch", "scan", "lockstep"):
        raise ValueError(
            f"unknown protocol {protocol!r}; one of "
            "('dispatch', 'scan', 'lockstep')"
        )
    pipelines = tuple(int(p) for p in pipelines)
    if any(p not in (1, 2) for p in pipelines):
        raise ValueError(f"pipelines entries must be 1 or 2, got {pipelines}")
    hops = tuple(int(t) for t in hops)
    if not hops or any(t < 1 for t in hops):
        # hops=0 would ZeroDivisionError in the divisibility check below
        # and a negative T would silently time an empty loop (reporting
        # a near-zero seconds_per_block that wins "best").
        raise ValueError(f"hops entries must be >= 1, got {hops}")
    if protocol != "lockstep" and pipelines != (1,):
        raise ValueError(
            "pipelines is a lockstep-protocol knob (the scan/dispatch "
            "protocols are already async-pipelined by jax dispatch); "
            f"got pipelines={pipelines} with protocol={protocol!r}"
        )

    candidates = []
    for b in batch_sizes:
        if engine == "xla":
            # group is a pallas-only knob: one candidate per batch,
            # not one per group value (they'd be the same pool thrice,
            # mislabeled .../G8, .../G16, .../G32).  hops likewise:
            # the XLA pool has no multi-hop kernel.
            for pp in pipelines:
                candidates.append({"batch": int(b), "group": None,
                                   "engine": "xla", "hops": 1,
                                   "pipeline": pp})
        else:
            for g in groups:
                if int(b) % int(g) != 0:
                    continue  # pool constraint: streams divide by group
                for t in hops:
                    if int(blocks) % int(t) != 0:
                        continue  # visit length must cover whole slabs
                    for pp in pipelines:
                        candidates.append({"batch": int(b),
                                           "group": int(g),
                                           "engine": engine,
                                           "hops": int(t),
                                           "pipeline": pp})
        if include_xla and engine != "xla":
            for pp in pipelines:
                candidates.append({"batch": int(b), "group": None,
                                   "engine": "xla", "hops": 1,
                                   "pipeline": pp})

    built = []
    results = []
    seen_groupless = set()  # 'auto' resolving to XLA ignores group
    scan_inputs = {}  # (batch, hops) -> device blocks [n, 2, B, T*hw]
    # Pipeline variants time the SAME pool with a different fetch
    # schedule — share one build (and its compile) across them.
    pool_cache = {}  # (engine, batch, group, hops) -> (pool, push, xl, xr)
    for cand in candidates:
        T = cand["hops"]
        P = cand.get("pipeline", 1)
        label = (f"{cand['engine']}/B{cand['batch']}" +
                 (f"/G{cand['group']}" if cand["group"] else "") +
                 (f"/T{T}" if T > 1 else "") +
                 (f"/P{P}" if P > 1 else ""))
        rec = dict(cand, label=label, ok=False, error=None,
                   seconds_per_block=None, us_per_block_stream=None,
                   streams_per_chip=None)
        cache_key = (cand["engine"], cand["batch"], cand["group"], T)
        if cache_key in pool_cache:
            pool, push, xl, xr = pool_cache[cache_key]
            rec["visits"] = []
            built.append((rec, (pool, push), xl, xr))
            results.append(rec)
            continue
        try:
            pool = _build_candidate(
                config, hw_block, cand["batch"], cand["engine"],
                cand["group"] or 16, layout, ola,
            )
            if not hasattr(pool, "group"):
                # engine='auto' resolved to the XLA pool: group is
                # meaningless, so time only one candidate per batch —
                # and it has no multi-hop kernel at all.
                if T > 1:
                    rec["error"] = ("infeasible: resolved engine has no "
                                    "multi-hop (temporal batching) step")
                    results.append(rec)
                    continue
                key = (cand["batch"], type(pool).__name__, P)
                if key in seen_groupless:
                    rec["error"] = "duplicate: resolved engine ignores group"
                    results.append(rec)
                    continue
                seen_groupless.add(key)
            import jax
            import jax.numpy as jnp

            if protocol == "scan":
                if T > 1:
                    run, fresh = pool.make_sustained_runner(
                        blocks, unroll, hops=T
                    )
                else:
                    run, fresh = pool.make_sustained_runner(blocks, unroll)
                # ONE input tensor per (batch, hops), generated on
                # device and shared by every same-shape candidate (it
                # can be GBs at production batch sizes).  The hops=T
                # slab is the hops=1 tensor regrouped so every variant
                # consumes the identical sample stream.
                blk = scan_inputs.get((cand["batch"], T))
                if blk is None:
                    base = scan_inputs.get((cand["batch"], 1))
                    if base is None:
                        base = jax.jit(
                            lambda k, b=cand["batch"]: jax.random.normal(
                                k, (blocks, 2, b, hw_block), jnp.float32
                            ) * 0.3
                        )(jax.random.PRNGKey(cand["batch"]))
                        base.block_until_ready()
                        scan_inputs[(cand["batch"], 1)] = base
                    if T == 1:
                        blk = base
                    else:
                        b = cand["batch"]
                        blk = jax.jit(
                            lambda a: a.reshape(
                                blocks // T, T, 2, b, hw_block
                            ).transpose(0, 2, 3, 1, 4).reshape(
                                blocks // T, 2, b, T * hw_block
                            )
                        )(base)
                        blk.block_until_ready()
                        scan_inputs[(cand["batch"], T)] = blk
                # Warm: compile + one full chain off the clock.
                _, cs = run(fresh(), blk)
                float(np.asarray(cs[-1, 0, 0]))
                rec["visits"] = []
                built.append((rec, (run, fresh), blk, None))
                results.append(rec)
                continue
            # Device-resident zeros: a HOST array here would upload
            # B*T*hw floats per warm push through the transport (128 MB
            # at B=2048, T=8 — minutes on a slow tunnel).
            zl = jnp.zeros((cand["batch"], T * hw_block), jnp.float32)
            zl.block_until_ready()
            push = pool.push_blocks_multi if T > 1 else pool.push_blocks
            # Warm: trigger compile + first-dispatch costs off the clock.
            push(zl, zl)
            c, _, _ = push(zl, zl)
            # Slice ON DEVICE before fetching: np.asarray(c) would pull
            # the whole [B, T*hw] C output over the transport (64 MB at
            # B=2048, T=4 — it measures the link, not the pool).
            float(np.asarray(c[0, 0]))
        except Exception as e:  # build or compile rejection
            rec["error"] = f"{type(e).__name__}: {e}"
            results.append(rec)
            if verbose:
                print(f"tune: {label}: FAILED ({type(e).__name__})",
                      flush=True)
            continue
        if protocol == "lockstep":
            # HOST inputs, deliberately: the lockstep serving cycle
            # uploads np.stack'd socket blocks every dispatch, so the
            # transfer is part of what this protocol measures.
            rng = np.random.default_rng(len(built))
            xh = (rng.standard_normal(
                (2, zl.shape[0], T * hw_block)
            ) * 0.3).astype(np.float32)
            xl, xr = xh[0], xh[1]
        else:
            # Build the visit input ON DEVICE, once per candidate:
            # push_blocks with a host array would move 2*B*hw floats per
            # block over the transport — on a slow link that measures
            # the link, not the pool.
            import jax
            import jax.numpy as jnp

            x = jax.jit(
                lambda k: jax.random.normal(
                    k, (2, zl.shape[0], T * hw_block), jnp.float32
                ) * 0.3
            )(jax.random.PRNGKey(len(built)))
            x.block_until_ready()
            # Pre-slice the channels: x[0]/x[1] inside the timed loop
            # would issue two extra eager device ops per block.
            xl, xr = x[0], x[1]
            jax.block_until_ready((xl, xr))
        rec["visits"] = []
        built.append((rec, (pool, push), xl, xr))
        results.append(rec)
        pool_cache[cache_key] = (pool, push, xl, xr)

    # Transport floor: the cheapest possible dispatch+fetch round trip.
    # Reported alongside the candidates so a tunnel-gated sweep is
    # recognizable (floor ~= per-block time => absolute numbers are
    # lower bounds; relative same-batch ordering still holds).
    transport_floor = None
    if built:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda a: a + 1.0)
        dev = jnp.zeros(())
        float(np.asarray(tiny(dev)))  # compile off the clock
        floors = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(tiny(dev)))
            floors.append(time.perf_counter() - t0)
        transport_floor = min(floors)

    for v in range(int(visits)):
        for rec, pool, xl, xr in built:
            if protocol == "scan":
                run, fresh = pool
                st = fresh()  # state allocation outside the timed region
                t0 = time.perf_counter()
                _, cs = run(st, xl)
                float(np.asarray(cs[-1, 0, 0]))  # bound the whole chain
                dt = (time.perf_counter() - t0) / int(blocks)
            elif protocol == "lockstep":
                _, push = pool
                T = rec["hops"]
                P = rec.get("pipeline", 1)
                pending = None
                t0 = time.perf_counter()
                for _ in range(int(blocks) // T):
                    # Full host round trip per cycle ON PURPOSE: the
                    # serving dispatcher can't issue the next cycle
                    # until this one's outputs are on their way to the
                    # sockets.  hops=T amortizes exactly this;
                    # pipeline=2 parks each cycle's device outputs and
                    # fetches them after dispatching the NEXT cycle
                    # (StreamServer(pipeline=2)'s schedule).
                    out = push(xl, xr)
                    if P > 1:
                        if pending is not None:
                            for o in pending:
                                np.asarray(o)
                        pending = out
                    else:
                        for o in out:
                            np.asarray(o)
                if pending is not None:
                    for o in pending:
                        np.asarray(o)
                dt = (time.perf_counter() - t0) / int(blocks)
            else:
                _, push = pool
                T = rec["hops"]
                t0 = time.perf_counter()
                out = None
                for _ in range(int(blocks) // T):
                    out = push(xl, xr)
                # Bound the chained steps with a DEVICE-SLICED scalar
                # fetch: np.asarray(out[0]) materializes the whole C
                # block host-side inside the timed region (B*T*hw*4
                # bytes/visit), which swamps the multi-hop candidates
                # it exists to resolve (measured: T4 at B=2048 read
                # 115-190 ms/block vs T1's 33 through a 29 ms-RTT
                # tunnel — the 48 MB/visit fetch delta, not the pool).
                float(np.asarray(out[0][0, 0]))
                dt = (time.perf_counter() - t0) / int(blocks)
            rec["visits"].append(dt)
            if verbose:
                print(f"tune: visit {v} {rec['label']:>16s}: "
                      f"{dt * 1e3:8.3f} ms/block", flush=True)

    best = None
    for rec in results:
        if rec.get("visits"):
            t = min(rec["visits"])
            rec["ok"] = True
            rec["seconds_per_block"] = t
            rec["us_per_block_stream"] = t / rec["batch"] * 1e6
            rec["streams_per_chip"] = rec["batch"] * block_seconds / t
            if best is None or rec["streams_per_chip"] > best["streams_per_chip"]:
                best = rec
        rec.pop("visits", None)

    if verbose and transport_floor is not None:
        print(f"tune: transport floor {transport_floor * 1e3:.2f} ms "
              f"(trivial dispatch+fetch)", flush=True)
    if verbose and best is not None:
        print(f"tune: best {best['label']}: "
              f"{best['streams_per_chip']:.0f} realtime streams/chip "
              f"({best['us_per_block_stream']:.2f} us/block/stream)",
              flush=True)
    return {
        "results": results,
        "best": best,
        "protocol": {"name": protocol, "blocks": int(blocks),
                     "visits": int(visits),
                     "unroll": int(unroll) if protocol == "scan" else None,
                     "hops": [int(t) for t in hops],
                     "pipelines": list(pipelines),
                     "estimator": "min-of-visits, interleaved",
                     "layout": layout, "ola": ola,
                     "transport_floor_seconds": transport_floor},
    }


def tune_offline(
    config=None,
    *,
    sr: float = 44100.0,
    band_edges=(0.0, 30.0, 120.0, 480.0, 1920.0, 7680.0),
    max_block_size: int = 2**16,
    n_samples: int = 2**21,
    chunks=(2**19, 2**20, 2**21, 2**22),
    kernel: str = "auto",
    inner: int = 6,
    visits: int = 3,
    verbose: bool = True,
) -> dict:
    """Autotune the offline pipeline's chunk size for the attached device.

    The offline scan's chunk size trades scan-step count against working-
    set locality; the v5e optimum (2^21, models/offline.py CHUNK_SAMPLES)
    was found by hand with bench.py's chained-application protocol.  This
    sweep re-derives it for new hardware: each candidate builds
    build_offline_fn(config, n_samples, chunk=c) and times `inner`
    applications dependency-chained inside ONE jitted dispatch (a scalar
    of each output seeds the next input, so a remote runtime cannot
    overlap them), interleaved round-robin with min-of-visits — the same
    burst-noise discipline as tune_pool.  chunk=0 means one whole-file
    program (no scan).

    Returns {"results": [...], "best": {...}, "protocol": {...}} with
    per-candidate seconds_per_application and realtime_factor
    (audio-seconds per wall-second, the BASELINE.md headline metric).
    """
    import jax
    import jax.numpy as jnp

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.models.offline import build_offline_fn

    if config is None:
        config = UpmixConfig.make(
            list(band_edges), sr=sr, max_block_size=max_block_size
        )
    if inner < 1 or visits < 1:
        raise ValueError("inner and visits must be >= 1")

    # Chunking only exists on the 'mm' scan kernel with pow2/divisible
    # band geometry (build_offline_fn's gates).  When inactive, every
    # chunk candidate builds the IDENTICAL whole-file program — ranking
    # noise between copies of one program is not a sweep, so build one
    # candidate and record the rest as duplicates (no silent caps).
    from upmix_tpu.models.offline import resolve_kernel

    try:
        kern = resolve_kernel(kernel)
    except ValueError:
        kern = None  # unknown kernel: every candidate records the error
    chunk_active = (
        kern == "mm"
        and all(b.block_size % b.hop_size == 0 for b in config.bands)
        and all(b.block_size & (b.block_size - 1) == 0 for b in config.bands)
    )
    if not chunk_active and verbose:
        print(
            f"tune: WARNING — chunking is inactive here (kernel resolves "
            f"to {kern!r} / geometry not pow2-divisible): every candidate "
            "is the same whole-file program; building one",
            flush=True,
        )

    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.standard_normal(n_samples), jnp.float32)
    R = jnp.asarray(rng.standard_normal(n_samples), jnp.float32)
    L, R = jax.device_put((L, R))
    jax.block_until_ready((L, R))

    results = []
    built = []
    first_label = None
    clamped_label = None
    for c in chunks:
        c = int(c)
        label = "whole" if c == 0 else f"chunk={c}"
        rec = {"chunk": c, "label": label, "ok": False}
        results.append(rec)
        if not chunk_active and first_label is not None:
            rec["error"] = (
                f"chunking inactive — identical program to {first_label}"
            )
            continue
        if chunk_active and c >= n_samples and c > 0:
            # The builder clamps any chunk >= the input to "whole input,
            # one scan step" — only the first such candidate is distinct.
            if clamped_label is not None:
                rec["error"] = (
                    f"clamps to the input length — duplicate of "
                    f"{clamped_label}"
                )
                continue
            clamped_label = label
        try:
            base = build_offline_fn(config, n_samples, kernel=kernel, chunk=c)

            def step(L, R, seed, base=base):
                for _ in range(inner):
                    cc, _ls, _rs = base(L + seed, R - seed)
                    seed = cc[0] * 1e-6
                return seed

            fn = jax.jit(step)
            seed = jnp.zeros((), jnp.float32)
            float(np.asarray(fn(L, R, seed)))  # compile + warm off the clock
        except Exception as e:  # infeasible candidate: record, keep going
            rec["error"] = f"{type(e).__name__}: {e}"
            if verbose:
                print(f"tune: {label} infeasible: {rec['error']}", flush=True)
            continue
        rec["visits"] = []
        built.append((rec, fn))
        if first_label is None:
            first_label = label

    for _v in range(int(visits)):
        for rec, fn in built:
            seed = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            float(np.asarray(fn(L, R, seed)))
            rec["visits"].append((time.perf_counter() - t0) / int(inner))

    audio_seconds = n_samples / float(config.sr)
    best = None
    for rec in results:
        if rec.get("visits"):
            t = min(rec["visits"])
            rec["ok"] = True
            rec["seconds_per_application"] = t
            rec["realtime_factor"] = audio_seconds / t
            if best is None or rec["realtime_factor"] > best["realtime_factor"]:
                best = rec
        rec.pop("visits", None)
        if verbose and rec["ok"]:
            print(f"tune: {rec['label']}: {rec['realtime_factor']:.0f}x "
                  f"realtime ({rec['seconds_per_application'] * 1e3:.2f} ms "
                  f"per {audio_seconds:.1f} s of audio)", flush=True)
    if verbose and best is not None:
        print(f"tune: best {best['label']}: "
              f"{best['realtime_factor']:.0f}x realtime", flush=True)
    return {
        "results": results,
        "best": best,
        "protocol": {"name": "offline", "n_samples": int(n_samples),
                     "inner": int(inner), "visits": int(visits),
                     "kernel": kernel, "chunk_active": chunk_active,
                     "estimator": "min-of-visits, interleaved"},
    }


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="autotune the serving pool's (batch, group) — or, "
        "with --offline, the offline pipeline's chunk size — for the "
        "attached device"
    )
    ap.add_argument("--offline", action="store_true",
                    help="tune the offline pipeline's scan chunk size "
                    "instead of the serving pool (--chunks/--samples/"
                    "--inner; --sr defaults to 44100 and --edges to the "
                    "reference offline config in this mode)")
    ap.add_argument("--chunks", default="524288,1048576,2097152,4194304",
                    help="offline mode: chunk sizes to sweep, comma-"
                    "separated (0 = one whole-file program)")
    ap.add_argument("--samples", type=int, default=2**21,
                    help="offline mode: input length per application")
    ap.add_argument("--inner", type=int, default=6,
                    help="offline mode: applications chained per timed "
                    "dispatch")
    ap.add_argument("--kernel", default="auto",
                    help="offline mode: transform kernel (auto/mm/xla)")
    ap.add_argument("--max-block-size", type=int, default=2**16,
                    help="offline mode: per-band STFT size cap")
    ap.add_argument("--sr", type=float, default=None)
    ap.add_argument("--hw-block", type=int, default=2048)
    ap.add_argument("--edges", default=None,
                    help="band edges in Hz, comma-separated (default: "
                    "0,500,2000,8000 for the pool; the reference "
                    "offline 6-band config with --offline)")
    ap.add_argument("--batches", default="512,1024,2048,4096")
    ap.add_argument("--groups", default="8,16,32")
    ap.add_argument("--engine", default="pallas",
                    choices=("pallas", "xla", "auto"))
    ap.add_argument("--layout", default="quarters")
    ap.add_argument("--ola", default="time", choices=("time", "spectral"))
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--visits", type=int, default=3)
    ap.add_argument("--include-xla", action="store_true")
    ap.add_argument("--protocol", default="dispatch",
                    choices=("dispatch", "scan", "lockstep"),
                    help="dispatch = sustained push_blocks (async-"
                    "pipelined dispatch surface); scan = one-dispatch "
                    "chained steps (chip-side capacity, resolves G even "
                    "through a high-RTT link); lockstep = full serving "
                    "cycle incl. host input upload + 3-output fetch "
                    "(the stream-server dispatcher's cost model — "
                    "resolves the hops knob)")
    ap.add_argument("--unroll", type=int, default=8,
                    help="scan protocol: steps per scan iteration "
                    "(quarters layout needs >1)")
    ap.add_argument("--hops", default="1",
                    help="temporal batching depths to sweep, comma-"
                    "separated (pallas quarters pools only; hops=T runs "
                    "T blocks per kernel launch at T block deadlines of "
                    "added input latency)")
    ap.add_argument("--pipelines", default="1",
                    help="pipelined-dispatch depths to sweep, comma-"
                    "separated (lockstep protocol only; 2 = fetch each "
                    "cycle's outputs after dispatching the next, "
                    "overlapping host fetch with chip compute)")
    ap.add_argument("--json", action="store_true",
                    help="print the full report as one JSON line")
    args = ap.parse_args(argv)

    from upmix_tpu.config import UpmixConfig
    from upmix_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.offline:
        report = tune_offline(
            sr=args.sr if args.sr is not None else 44100.0,
            band_edges=[
                float(e)
                for e in (args.edges or "0,30,120,480,1920,7680").split(",")
            ],
            max_block_size=args.max_block_size,
            n_samples=args.samples,
            chunks=[int(c) for c in args.chunks.split(",")],
            kernel=args.kernel,
            inner=args.inner,
            visits=args.visits,
            verbose=not args.json,
        )
        if args.json:
            print(json.dumps(report))
        elif report["best"] is None:
            print("tune: no candidate compiled", flush=True)
        return 0 if report["best"] is not None else 1
    config = UpmixConfig.streaming(
        [float(e) for e in (args.edges or "0,500,2000,8000").split(",")],
        sr=args.sr if args.sr is not None else 48000.0, hw_block_size=args.hw_block,
    )
    report = tune_pool(
        config, args.hw_block,
        batch_sizes=[int(b) for b in args.batches.split(",")],
        groups=[int(g) for g in args.groups.split(",")],
        engine=args.engine, layout=args.layout, ola=args.ola,
        blocks=args.blocks, visits=args.visits,
        include_xla=args.include_xla, protocol=args.protocol,
        unroll=args.unroll,
        hops=[int(t) for t in args.hops.split(",")],
        pipelines=[int(p) for p in args.pipelines.split(",")],
        verbose=not args.json,
    )
    if args.json:
        print(json.dumps(report))
    elif report["best"] is None:
        print("tune: no candidate compiled", flush=True)
    # A sweep where every candidate failed is a failure regardless of
    # the output format — scripted (--json) runs must see exit 1 too.
    return 0 if report["best"] is not None else 1


if __name__ == "__main__":
    raise SystemExit(main())
