"""Checkpoint / resume for long-running proofs.

The reference has no persistence at all (SURVEY.md section 5); for
production proving at 2^24+ a preempted prover must not restart from
scratch.  This module snapshots the full mid-proof state - sumcheck
tables, every FRI layer's codeword pairs and digest layers, the
Fiat-Shamir transcript midstate, the round counter and collected round
polynomials - into one .npz file, and restores it to continue on any
host with the same devices.  Resumed proofs are byte-identical to
uninterrupted ones (tested).

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


def save_pcs_state(
    path: str,
    tables: SumcheckTables,
    fri_data: FriProverData,
    transcript: Transcript,
    round_k: int,
    previous_sum: Fp,
    pols: List[SumcheckPoly],
) -> None:
    store = {}
    meta = {
        "round_k": round_k,
        "previous_sum": previous_sum.v,
        "pols": [[c.v for c in p.nonzero_coeffs] for p in pols],
        "tables_width": tables.width,
        "tables_height": tables.height,
        "tables_on_host": tables.on_host,
        "fri_log_domain": fri_data._log_domain,
        "fri_last_element": (
            fri_data.last_element.v if fri_data.last_element is not None else None
        ),
        "fri_current_kind": (
            "host" if fri_data._current_host is not None
            else ("device" if fri_data._current is not None else "none")
        ),
        "trees": [],
    }
    # transcript midstate
    st, buf, total = transcript.export_state()
    _put(store, "tr_st", st)
    store["tr_buf"] = np.frombuffer(buf, dtype=np.uint8).copy()
    meta["tr_total"] = total

    # sumcheck tables
    if tables.on_host:
        for j, col in enumerate(tables.host_matrix):
            _put(store, f"sc_col{j}", col)
        _put(store, "sc_delta", tables.host_delta)
    else:
        _put(store, "sc_data", tables.data)

    # FRI current codeword
    if fri_data._current_host is not None:
        _put(store, "fri_cur", fri_data._current_host)
    elif fri_data._current is not None:
        _put(store, "fri_cur", fri_data._current)

    # FRI trees
    for t_i, tree in enumerate(fri_data.trees):
        if isinstance(tree, MerkleTree):
            meta["trees"].append({"kind": "device", "levels": len(tree.layers)})
            _put(store, f"tree{t_i}_cols", tree.leaf_columns)
            for l_i, layer in enumerate(tree.layers):
                _put(store, f"tree{t_i}_layer{l_i}", layer)
        else:
            meta["trees"].append(
                {"kind": "host", "levels": len(tree.layers), "ncols": len(tree.columns)}
            )
            for c_i, col in enumerate(tree.columns):
                _put(store, f"tree{t_i}_col{c_i}", col)
            for l_i, layer in enumerate(tree.layers):
                _put(store, f"tree{t_i}_layer{l_i}", layer)

    store["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(normalize_ckpt_path(path), **store)


def load_pcs_state(path: str):
    """Returns (tables, fri_data, transcript, round_k, previous_sum, pols)."""
    z = np.load(normalize_ckpt_path(path), allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode())

    transcript = Transcript.import_state(
        z["tr_st"], z["tr_buf"].tobytes(), meta["tr_total"]
    )

    width, height = meta["tables_width"], meta["tables_height"]
    if meta["tables_on_host"]:
        cols = [z[f"sc_col{j}"] for j in range(width)]
        tables = SumcheckTables._host_from_ints(cols, z["sc_delta"], width, height)
    else:
        tables = SumcheckTables.__new__(SumcheckTables)
        tables.data = jnp.asarray(z["sc_data"])
        tables.width = width
        tables.height = height
        # checkpointed tables are PCS-session state: the PCS crossover
        tables.host_threshold = get_config().host_threshold
        tables.host_matrix = None
        tables.host_delta = None

    fri_data = FriProverData()
    fri_data._log_domain = meta["fri_log_domain"]
    if meta["fri_last_element"] is not None:
        fri_data.last_element = Fp(int(meta["fri_last_element"]))
    if meta["fri_current_kind"] == "host":
        fri_data._current_host = z["fri_cur"]
    elif meta["fri_current_kind"] == "device":
        fri_data._current = jnp.asarray(z["fri_cur"])

    for t_i, tmeta in enumerate(meta["trees"]):
        if tmeta["kind"] == "device":
            layers = [jnp.asarray(z[f"tree{t_i}_layer{l}"]) for l in range(tmeta["levels"])]
            tree = MerkleTree(layers, jnp.asarray(z[f"tree{t_i}_cols"]))
        else:
            tree = FieldHostTree.__new__(FieldHostTree)
            tree.columns = [z[f"tree{t_i}_col{c}"] for c in range(tmeta["ncols"])]
            tree.layers = [z[f"tree{t_i}_layer{l}"] for l in range(tmeta["levels"])]
        fri_data.trees.append(tree)

    pols = [SumcheckPoly([Fp(int(c)) for c in cs]) for cs in meta["pols"]]
    return (
        tables,
        fri_data,
        transcript,
        meta["round_k"],
        Fp(int(meta["previous_sum"])),
        pols,
    )
