"""Checkpoint / resume for long-running proofs.

The reference has no persistence at all (SURVEY.md section 5); for
production proving at 2^24+ a preempted prover must not restart from
scratch.  This module snapshots mid-proof state - sumcheck tables, every
FRI layer's codeword pairs and digest layers, the Fiat-Shamir transcript
midstate, the round counter and collected round polynomials - into one
.npz file, and restores it to continue on any host with the same devices.
Resumed proofs are byte-identical to uninterrupted ones (tested).

Covered proof types (round-3 VERDICT item 7): plain PCS
(pcs.PCSProverSession), batched PCS (batched_pcs.BatchedPCSProverSession -
adds the batch column tree + fingerprint challenge), and the SNARK flow
(system.SnarkProverSession - adds the trace columns, drawn challenges and
the trace-sumcheck state; its PCS phase delegates to the PCS sessions).

Checkpoint size ~= 3x the committed codeword (the Merkle leaf payloads
dominate), the same data the prover must hold live anyway.
"""

from __future__ import annotations

import json
from typing import List

import jax.numpy as jnp
import numpy as np

from .config import get_config
from .field.scalar import Fp
from .fri import FriProverData
from .merkle import FieldHostTree, MerkleTree
from .sumcheck import SumcheckPoly, SumcheckTables
from .transcript import Transcript


def normalize_ckpt_path(path: str) -> str:
    """np.savez_compressed appends '.npz' when missing; normalize once so
    save, load, and the .claim sidecar all agree on the file name."""
    return path if path.endswith(".npz") else path + ".npz"


def _put(store, key, arr):
    store[key] = np.asarray(arr)


# -- shared helpers -----------------------------------------------------------


def _store_tree(store, meta_trees: list, prefix: str, tree) -> None:
    if isinstance(tree, MerkleTree):
        meta_trees.append(
            {
                "kind": "device",
                "levels": len(tree.layers),
                "bitrev": bool(tree.bitrev_levels),
            }
        )
        _put(store, f"{prefix}_cols", tree.leaf_columns)
        for l_i, layer in enumerate(tree.layers):
            _put(store, f"{prefix}_layer{l_i}", layer)
    else:
        meta_trees.append(
            {"kind": "host", "levels": len(tree.layers), "ncols": len(tree.columns)}
        )
        for c_i, col in enumerate(tree.columns):
            _put(store, f"{prefix}_col{c_i}", col)
        for l_i, layer in enumerate(tree.layers):
            _put(store, f"{prefix}_layer{l_i}", layer)


def _load_tree(z, tmeta, prefix: str):
    if tmeta["kind"] == "device":
        layers = [jnp.asarray(z[f"{prefix}_layer{l}"]) for l in range(tmeta["levels"])]
        return MerkleTree(
            layers,
            jnp.asarray(z[f"{prefix}_cols"]),
            bitrev_levels=tmeta.get("bitrev", False),
        )
    tree = FieldHostTree.__new__(FieldHostTree)
    tree.columns = [z[f"{prefix}_col{c}"] for c in range(tmeta["ncols"])]
    tree.layers = [z[f"{prefix}_layer{l}"] for l in range(tmeta["levels"])]
    return tree


def _store_tables(store, meta, tables: SumcheckTables) -> None:
    meta["tables_width"] = tables.width
    meta["tables_height"] = tables.height
    meta["tables_on_host"] = tables.on_host
    if tables.on_host:
        for j, col in enumerate(tables.host_matrix):
            _put(store, f"sc_col{j}", col)
        _put(store, "sc_delta", tables.host_delta)
    else:
        _put(store, "sc_data", tables.data)


def _load_tables(z, meta, trace: bool = False) -> SumcheckTables:
    width, height = meta["tables_width"], meta["tables_height"]
    if meta["tables_on_host"]:
        cols = [z[f"sc_col{j}"] for j in range(width)]
        return SumcheckTables._host_from_ints(cols, z["sc_delta"], width, height)
    from .config import sc_host_threshold_value

    tables = SumcheckTables.__new__(SumcheckTables)
    tables.data = jnp.asarray(z["sc_data"])
    tables.width = width
    tables.height = height
    # PCS-session tables use the PCS crossover; trace-sumcheck tables the
    # (deeper-streaming) trace crossover - same resolution as construction
    tables.host_threshold = (
        sc_host_threshold_value() if trace else get_config().host_threshold
    )
    tables.host_matrix = None
    tables.host_delta = None
    return tables


def _store_fri(store, meta, fri_data: FriProverData) -> None:
    meta["fri_log_domain"] = fri_data._log_domain
    meta["fri_last_element"] = (
        fri_data.last_element.v if fri_data.last_element is not None else None
    )
    meta["fri_current_kind"] = (
        "host" if fri_data._current_host is not None
        else ("device" if fri_data._current is not None else "none")
    )
    meta["trees"] = []
    if fri_data._current_host is not None:
        _put(store, "fri_cur", fri_data._current_host)
    elif fri_data._current is not None:
        _put(store, "fri_cur", fri_data._current)
    for t_i, tree in enumerate(fri_data.trees):
        _store_tree(store, meta["trees"], f"tree{t_i}", tree)


def _load_fri(z, meta) -> FriProverData:
    fri_data = FriProverData()
    fri_data._log_domain = meta["fri_log_domain"]
    if meta["fri_last_element"] is not None:
        fri_data.last_element = Fp(int(meta["fri_last_element"]))
    if meta["fri_current_kind"] == "host":
        fri_data._current_host = z["fri_cur"]
    elif meta["fri_current_kind"] == "device":
        fri_data._current = jnp.asarray(z["fri_cur"])
    for t_i, tmeta in enumerate(meta["trees"]):
        fri_data.trees.append(_load_tree(z, tmeta, f"tree{t_i}"))
    return fri_data


def _store_transcript(store, meta, transcript: Transcript) -> None:
    st, buf, total = transcript.export_state()
    _put(store, "tr_st", st)
    store["tr_buf"] = np.frombuffer(buf, dtype=np.uint8).copy()
    meta["tr_total"] = total


def _load_transcript(z, meta) -> Transcript:
    return Transcript.import_state(z["tr_st"], z["tr_buf"].tobytes(), meta["tr_total"])


def _store_core(store, meta, tables, fri_data, transcript, round_k, previous_sum, pols):
    meta["round_k"] = round_k
    meta["previous_sum"] = previous_sum.v
    meta["pols"] = [[c.v for c in p.nonzero_coeffs] for p in pols]
    _store_transcript(store, meta, transcript)
    _store_tables(store, meta, tables)
    _store_fri(store, meta, fri_data)


def _load_core(z, meta):
    transcript = _load_transcript(z, meta)
    tables = _load_tables(z, meta)
    fri_data = _load_fri(z, meta)
    pols = [SumcheckPoly([Fp(int(c)) for c in cs]) for cs in meta["pols"]]
    return (
        tables,
        fri_data,
        transcript,
        meta["round_k"],
        Fp(int(meta["previous_sum"])),
        pols,
    )


def _finalize(path: str, store, meta) -> None:
    store["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(normalize_ckpt_path(path), **store)


def _open(path: str):
    z = np.load(normalize_ckpt_path(path), allow_pickle=False)
    return z, json.loads(bytes(z["meta"]).decode())


# -- plain PCS ---------------------------------------------------------------


def save_pcs_state(
    path: str,
    tables: SumcheckTables,
    fri_data: FriProverData,
    transcript: Transcript,
    round_k: int,
    previous_sum: Fp,
    pols: List[SumcheckPoly],
) -> None:
    store, meta = {}, {"kind": "pcs"}
    _store_core(store, meta, tables, fri_data, transcript, round_k, previous_sum, pols)
    _finalize(path, store, meta)


def load_pcs_state(path: str):
    """Returns (tables, fri_data, transcript, round_k, previous_sum, pols)."""
    z, meta = _open(path)
    return _load_core(z, meta)


# -- batched PCS --------------------------------------------------------------


def save_batched_pcs_state(
    path: str,
    tables: SumcheckTables,
    bfri,  # BatchedFriProverData (post-round-0: _codes already dropped)
    transcript: Transcript,
    round_k: int,
    previous_sum: Fp,
    pols: List[SumcheckPoly],
) -> None:
    store, meta = {}, {"kind": "batched_pcs"}
    _store_core(
        store, meta, tables, bfri.fri_data, transcript, round_k, previous_sum, pols
    )
    meta["fingerprint_r"] = bfri.fingerprint_r.v
    meta["batched_log_domain"] = bfri._log_domain
    meta["batch_tree"] = []
    _store_tree(store, meta["batch_tree"], "btree", bfri.batch_tree)
    _finalize(path, store, meta)


def load_batched_pcs_state(path: str):
    """Returns (tables, bfri, transcript, round_k, previous_sum, pols)."""
    from .batched_fri import BatchedFriProverData

    z, meta = _open(path)
    tables, fri_data, transcript, round_k, prev, pols = _load_core(z, meta)
    bfri = BatchedFriProverData.__new__(BatchedFriProverData)
    bfri.fingerprint_r = Fp(int(meta["fingerprint_r"]))
    bfri.fri_data = fri_data
    bfri._codes = None  # consumed by round 0 before any checkpoint
    bfri._codes_host = None
    bfri._log_domain = meta["batched_log_domain"]
    bfri.batch_tree = _load_tree(z, meta["batch_tree"][0], "btree")
    return tables, bfri, transcript, round_k, prev, pols


# -- SNARK (trace sumcheck phase; the PCS phase delegates to the sessions) ----


def save_snark_sumcheck_state(
    path: str,
    trace_columns,
    tables: SumcheckTables,
    transcript: Transcript,
    round_k: int,
    previous_sum: Fp,
    pols: List[SumcheckPoly],
    randoms: List[Fp],
    challenges,  # ChallengeSet
    sum_value: Fp,
) -> None:
    store, meta = {}, {"kind": "snark_sumcheck"}
    meta["round_k"] = round_k
    meta["previous_sum"] = previous_sum.v
    meta["pols"] = [[c.v for c in p.nonzero_coeffs] for p in pols]
    meta["randoms"] = [r.v for r in randoms]
    meta["sum_value"] = sum_value.v
    meta["challenges"] = {
        "row": [c.v for c in challenges.row],
        "trace": [c.v for c in challenges.trace],
        "constraint": [c.v for c in challenges.constraint],
    }
    _store_transcript(store, meta, transcript)
    _store_tables(store, meta, tables)
    _put(store, "trace_cols", trace_columns)
    _finalize(path, store, meta)


def load_snark_sumcheck_state(path: str):
    """Returns (trace_columns, tables, transcript, round_k, previous_sum,
    pols, randoms, challenges_dict, sum_value)."""
    z, meta = _open(path)
    transcript = _load_transcript(z, meta)
    tables = _load_tables(z, meta, trace=True)
    pols = [SumcheckPoly([Fp(int(c)) for c in cs]) for cs in meta["pols"]]
    randoms = [Fp(int(r)) for r in meta["randoms"]]
    ch = {
        k: [Fp(int(v)) for v in vs] for k, vs in meta["challenges"].items()
    }
    return (
        jnp.asarray(z["trace_cols"]),
        tables,
        transcript,
        meta["round_k"],
        Fp(int(meta["previous_sum"])),
        pols,
        randoms,
        ch,
        Fp(int(meta["sum_value"])),
    )
