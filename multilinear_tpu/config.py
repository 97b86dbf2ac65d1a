"""Runtime configuration for the proving stack.

The reference hard-codes ``LOG_BLOWUP = 1`` and ``NUM_QUERIES = 128``
(reference src/fri/mod.rs:16-17) and has no other knobs; those defaults are
preserved here - changing them changes the proof format and transcript.
The TPU build adds the host/device crossover threshold and mesh shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class ProverConfig:
    # Below this table/codeword length the prover folds on the host
    # (native C++ runtime); purely a performance knob - transcripts are
    # identical either way.
    host_threshold: int = 1 << 12
    # mesh: None = single device; otherwise the number of devices to span
    mesh_devices: Optional[int] = None
    # The axon TPU backend rejects single programs whose live allocations
    # total roughly 2 GiB (RESOURCE_EXHAUSTED).  Rounds whose codeword is
    # LONGER than this cap run as several bounded dispatches (chunked
    # partial sums / folds / commits) instead of one fused round program;
    # at or below it the zero-sync streaming device round is used.
    # Transcripts are identical either way (pinned by tests).
    fused_round_max_code: int = 1 << 23
    # Value elements per chunked dispatch in the big-round path.
    kernel_chunk: int = 1 << 22
    # Stream oversized rounds as ONE device program each (chunked kernels
    # + on-device Fiat-Shamir, zero host syncs).  Larger per-program
    # footprint than the host-driven chunked dispatches; prove_with_retry
    # turns this off on RESOURCE_EXHAUSTED pressure.  Bit-identical
    # either way (pinned by tests).
    stream_oversized: bool = True
    # Fuse TWO consecutive streamed PCS rounds into one device program
    # when both fit under fused_round_max_code: halves the dispatch count
    # AND the number of distinct compiled programs (per-process cached-
    # executable loads cost ~0.4 s each over the tunnel).  Slightly larger
    # per-program footprint; prove_with_retry turns this off under OOM
    # pressure.  Bit-identical either way (pinned by tests).
    stream_round_pairs: bool = True
    # Fuse FOUR consecutive streamed PCS rounds when the leading codeword
    # is at or below this size (and all four rounds would stream).  The
    # tunnel's per-dispatch floor (~9-26 ms) dominates mid/small rounds
    # whose compute is a few ms; quads cut the tail's dispatch count in
    # half again vs pairs.  The top rounds keep the pair program (their
    # graphs/live sets are the large ones).  None = auto: 2^21 on a TPU
    # backend, 0 (disabled) elsewhere - XLA:CPU's compile time is
    # superlinear in program size (the quad takes ~300 s vs ~30 s for the
    # pair, tools/compile_probe.py methodology).  0 disables.
    # Bit-identical either way (pinned by tests + tools/tpu_checks.py).
    stream_round_quad_max_code: Optional[int] = None
    # Pallas (Mosaic) kernels for the hot primitives (field mul, FRI fold,
    # SHA-256 layers).  None = auto: on when running on a single real TPU
    # device; off on CPU and under multi-device GSPMD sharding (Pallas
    # calls are opaque to the XLA partitioner - the GSPMD path keeps the
    # jnp kernels).  Multi-device meshes get the fast kernels via the
    # EXPLICIT shard_map round instead (parallel/shard_step.py: each shard
    # is a local single-device block, so the Pallas kernels run per shard
    # at any mesh size; bit-identical, tests/test_shard_step.py).
    # True/False force.  Purely a performance knob; results are
    # bit-identical (pinned by tests/test_pallas.py).
    #
    # CAVEAT: the choice is read at TRACE time inside jitted functions and
    # jax caches compiled programs by shape - set use_pallas BEFORE the
    # first call at a given shape.  Toggling it later silently keeps the
    # previously-traced kernel for shapes already compiled in this process
    # (results stay identical; only which kernel runs differs).  Flip it in
    # a fresh process (or jax.clear_caches()) for benchmarking comparisons.
    use_pallas: Optional[bool] = None
    # shard_map streamed rounds: when the prover's arrays live on a
    # >1-device mesh, run each streamed PCS round as a shard_map program
    # whose local bodies dispatch the Pallas kernels per shard
    # (parallel/sharded_rounds.py) - the multi-chip fast path.  None =
    # auto (on whenever the inputs are on a multi-device mesh and shapes
    # divide the mesh); False forces the GSPMD jnp round (round-2
    # behavior); True is just documentation - the auto gate already
    # dispatches whenever legal.  Bit-identical either way (pinned by
    # tests/test_parallel.py).
    shard_map_rounds: Optional[bool] = None
    # Host-tail crossover for STANDALONE/trace sumcheck tables
    # (SumcheckTables.for_trace - the constraint-system / SNARK sumcheck).
    # Unlike the PCS tail (native C++ identity partial sums, fast), the
    # general-composition host tail evaluates arbitrary Python constraint
    # callables row by row: ~0.2 s per prove at the default 4096 threshold
    # (tools/sumcheck_probe.py) - the reference C++ baseline's ENTIRE
    # budget at 2^20 (sumcheck.rs:367-398).  Streamed device rounds cost
    # one async dispatch each, so on TPU the right answer is to stream
    # essentially to the bottom.  None = auto: 2 on a TPU backend, fall
    # back to host_threshold elsewhere (CPU test meshes would pay a fresh
    # fused-round XLA compile per halved shape per composition).
    # Transcripts are identical either way (pinned by tests).
    sc_host_threshold: Optional[int] = None
    # Standalone-sumcheck SCAN TAIL: once the (folded) table height is at
    # or below this, ALL remaining rounds run as ONE lax.scan device
    # program at fixed shape (sumcheck._sc_scan_tail) instead of one
    # dispatch per halved shape - per-dispatch tunnel latency (~9 ms) is
    # the entire tail cost otherwise (tools/sumcheck_probe.py).  The scan
    # body embeds the composition once, so it compiles like a single
    # round (the round-PAIR fusion that embedded it twice blew up XLA
    # compile time and was dropped in round 2).  0 disables.  The fixed
    # shape costs O(h0) per round: every round the scan absorbs REPLACES
    # one ~9 ms streamed dispatch with one full fixed-h0 pass, so it wins
    # only while R*pass(h0) < pass-work-saved + R*dispatch.  MEASURED on
    # the v5e (bench --metric sumcheck --log-n 20, round 4): h0=2^16 ->
    # 0.208 s, 2^17 -> 0.248 s, 2^22 -> 0.496 s - pass(2^16) ~ 3 ms vs
    # ~9 ms dispatch, and doubling h0 doubles every remaining pass.  The
    # crossover is where pass(h0) ~ dispatch: h0 ~ 2^17; 2^16 keeps slack
    # for wider tables.  Byte-identical everywhere (pinned).
    sc_scan_tail_height: Optional[int] = None
    # Oversized PCS rounds as a THREE-program split (chunked sumcheck
    # half + Pallas fused fold+leaf-hash + tree walk) instead of the one
    # chunked program.  ~130 ms faster at 2^24 when the chip is quiet
    # (fold+commit 44 ms vs 88+135 ms, tools/pcs_round_probe.py) but the
    # extra transient footprint lost the co-tenant HBM lottery repeatedly
    # in round-5 testing while the chunked path ran clean - keep the
    # robust default (round-1 lesson: a faster fused path that OOMs
    # whenever a neighbor spikes is not worth it).
    oversized_pallas_split: bool = False
    # Standalone-sumcheck ONE-DISPATCH mode: the whole protocol (streamed
    # rounds at shrinking shapes + the fixed-shape scan tail) as a single
    # device program (sumcheck._sc_fused_all) - per-dispatch tunnel
    # latency (~9 ms) was the dominant cost at 2^20 (0.208 s vs the
    # 0.199 s C++ single-core baseline, round 4).  The program embeds the
    # user composition n_stream+1 times, which XLA:CPU cannot compile in
    # reasonable time for real compositions (round-2 round-pair lesson),
    # so None = auto: on for a TPU backend only.  Byte-identical
    # transcripts either way (pinned by tests at tiny shapes).
    sc_one_dispatch: Optional[bool] = None
    # Debug-mode limb sanitizer (the TPU analog of a memory sanitizer,
    # SURVEY.md section 5): when True, protocol-boundary kernels attach a
    # host callback asserting every field element is canonical (16-bit
    # limbs, value < p).  Read at TRACE time like use_pallas - set it
    # before the first call of each shape.  Large overhead; tests only.
    debug_checks: bool = False


def sc_host_threshold_value() -> int:
    """Resolve the trace-sumcheck host-tail crossover (see the field doc)."""
    cfg = get_config()
    if cfg.sc_host_threshold is not None:
        return cfg.sc_host_threshold
    import jax

    try:
        if jax.default_backend() == "tpu":
            return 2
    except Exception:
        pass
    return cfg.host_threshold


def sc_scan_tail_value() -> int:
    """Resolve the standalone-sumcheck scan-tail height (see the field doc)."""
    cfg = get_config()
    if cfg.sc_scan_tail_height is not None:
        return cfg.sc_scan_tail_height
    return 1 << 16


def stream_round_quad_value() -> int:
    """Resolve the 4-round-fusion size cap (see the field doc)."""
    cfg = get_config()
    if cfg.stream_round_quad_max_code is not None:
        return cfg.stream_round_quad_max_code
    import jax

    try:
        return (1 << 21) if jax.default_backend() == "tpu" else 0
    except Exception:
        return 0


def sc_one_dispatch_enabled() -> bool:
    """Resolve the one-dispatch standalone-sumcheck gate (see the field doc)."""
    cfg = get_config()
    if cfg.sc_one_dispatch is not None:
        return cfg.sc_one_dispatch
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_enabled() -> bool:
    import jax

    cfg = get_config()
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False

    # NOTE: the protocol parameters LOG_BLOWUP (ntt.py) and NUM_QUERIES
    # (fri.py) are module constants, not config: changing them changes the
    # proof format and breaks reference-transcript parity, so they are
    # deliberately not runtime-tunable.


_config = ProverConfig()


def get_config() -> ProverConfig:
    return _config


def set_config(cfg: ProverConfig) -> None:
    global _config
    _config = cfg
