"""TPU smoke + timing for the ganged gather-rescore kernel.

Validates the aligned-group manual-DMA rewrite of
``pallas_gather_rescore`` (all C candidate groups of a query DMA'd on
one semaphore, one bf16 MXU dot) on the real chip against the XLA
gather path, on a 2-segment store, then times it at serving shapes with
the repo's slope methodology (``lax.scan`` reps inside one dispatch —
per-dispatch tunnel cost here is ~30 ms, which single-call timing
cannot see past). One JSON line per case:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_gather_smoke.py
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)

import jax
import jax.numpy as jnp

from bench import fetch_sync, timed_slope  # noqa: E402
from trie_semantic_search_tpu.ops.pallas_scan import pallas_gather_rescore
from trie_semantic_search_tpu.ops.scoring import gather_rescore

print(f"device: {jax.devices()[0]}", file=sys.stderr)

D = 384
SEG = 2
SEG_ROWS = 1 << 19  # 512k rows/segment -> 2-segment, ~800 MB bf16
N = SEG * SEG_ROWS
R_LO, R_HI, TRIALS = 4, 16, 4

rng = np.random.default_rng(7)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


segs = tuple(
    jnp.asarray(
        _norm(rng.standard_normal((SEG_ROWS, D), np.float32)), jnp.bfloat16
    )
    for _ in range(SEG)
)
jax.block_until_ready(segs)
print("segments resident", file=sys.stderr)


@functools.partial(jax.jit, static_argnames=())
def loop(qs_r, ids_r, s0, s1):
    def body(carry, qi):
        q, ids = qi
        re = pallas_gather_rescore(q, (s0, s1), ids)
        return carry + re.sum(), None

    acc, _ = jax.lax.scan(body, 0.0, (qs_r, ids_r))
    return acc


for B, C in ((32, 40), (8, 40), (32, 128)):
    q1 = jnp.asarray(_norm(rng.standard_normal((B, D), np.float32)))
    idx1 = jnp.asarray(rng.integers(0, N, size=(B, C), dtype=np.int32))
    t0 = time.perf_counter()
    got = pallas_gather_rescore(q1, segs, idx1)
    fetch_sync(got)
    compile_s = time.perf_counter() - t0
    want = gather_rescore(q1, segs, idx1)
    err = float(jnp.max(jnp.abs(got - jnp.asarray(want))))

    pools = {
        rv: [
            (
                jnp.asarray(
                    _norm(rng.standard_normal((rv, B, D), np.float32))
                ),
                jnp.asarray(
                    rng.integers(0, N, size=(rv, B, C), dtype=np.int32)
                ),
            )
            for _ in range(TRIALS + 1)
        ]
        for rv in (R_LO, R_HI)
    }
    jax.block_until_ready(pools)

    def run(rv, t):
        qs_r, ids_r = pools[rv][t]
        return loop(qs_r, ids_r, *segs)

    fetch_sync(run(R_LO, 0))
    fetch_sync(run(R_HI, 0))
    per_call_ms = timed_slope(run, R_LO, R_HI, trials=TRIALS) * 1000
    print(json.dumps({
        "case": f"B{B}_C{C}", "segments": SEG, "rows": N,
        "max_abs_err": err, "ok": bool(err < 1e-2),
        "per_call_ms": round(per_call_ms, 3),
        "gathered_kb": round(B * C * 16 * D * 2 / 1024, 1),
        "compile_s": round(compile_s, 1),
    }))
    sys.stdout.flush()
print("done", file=sys.stderr)
