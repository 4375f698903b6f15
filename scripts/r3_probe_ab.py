"""Isolate the probe-path cost: rescore gather vs in-program filter-column
derivation vs kernel DMA. One JSON line per variant."""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from trie_semantic_search_tpu.utils import guard_dead_tpu_relay

if guard_dead_tpu_relay():  # never futex-hang on a dead TPU relay
    print("warning: TPU relay unreachable - running on CPU backend",
          file=sys.stderr)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import fetch_sync, timed_slope  # noqa: E402
from trie_semantic_search_tpu.ops.hybrid import (  # noqa: E402
    fused_partitioned_topk,
)
from trie_semantic_search_tpu.ops.pallas_scan import (  # noqa: E402
    partition_filter_columns,
)

C, mc, D = 16384, 512, 384
N = C * mc
K = 10
TRIALS = 3
R_LO, R_HI = 2, 6

print(f"device: {jax.devices()[0]}", file=sys.stderr)
SLAB = 128


@jax.jit
def gen(keys):
    def one(key):
        kc, kn = jax.random.split(key)
        cent = jax.random.normal(kc, (SLAB, D), jnp.float32)
        cent /= jnp.linalg.norm(cent, axis=-1, keepdims=True)
        noise = jax.random.normal(kn, (SLAB, mc, D), jnp.float32)
        v = cent[:, None, :] + 0.35 * noise / np.sqrt(D)
        v /= jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.max(jnp.abs(v), axis=-1) / 127.0
        q = jnp.clip(jnp.round(v / scale[..., None]), -127, 127)
        return cent, q.astype(jnp.int8), scale, v.astype(jnp.bfloat16)

    return jax.lax.map(one, keys)


keys = jax.random.split(jax.random.PRNGKey(0), C // SLAB)
cents, blocks, scales, vbf = jax.block_until_ready(gen(keys))
ccent = cents.reshape(C, D)
corpus_bf16 = vbf.reshape(N, D)
del vbf
chunk_case = jnp.arange(N, dtype=jnp.int32)
chunk_court = (chunk_case % 16).astype(jnp.int32)
chunk_date = (chunk_case % 20000).astype(jnp.int32)
print("corpus generated", file=sys.stderr)

B = 32
GROUP = 2  # P=8192, m=1024
P = C // GROUP
m = mc * GROUP
cent = ccent.reshape(P, GROUP, D).mean(axis=1)
cent = cent / jnp.linalg.norm(cent, axis=-1, keepdims=True)
prows = jnp.arange(N, dtype=jnp.int32).reshape(P, m)
pint8 = blocks.reshape(P, m, D)
pscale = scales.reshape(P, m)
pcw, pcb, pdt = partition_filter_columns(
    np.asarray(prows), np.asarray(chunk_court), np.asarray(chunk_date)
)


def make_q(key, r, b):
    kp2, kn3 = jax.random.split(key)
    cl = jax.random.randint(kp2, (r, b), 0, C)
    out = ccent[cl] + 0.3 * jax.random.normal(
        kn3, (r, b, D), jnp.float32
    ) / np.sqrt(D)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


kq = jax.random.split(jax.random.PRNGKey(11), 64).reshape(2, 32, 2)
qpools = {
    rv: [make_q(kq[ri, t], rv, B) for t in range(TRIALS + 1)]
    for ri, rv in enumerate((R_LO, R_HI))
}
jax.block_until_ready(qpools)

ct = jnp.ones((B, 16), bool)
dlo = jnp.zeros(B, jnp.int32)
dhi = jnp.full(B, 2**31 - 1, jnp.int32)
tr = jnp.full((B, 8), -1, jnp.int32)
ts = jnp.full((B, 8), 3, jnp.int32)
msim = jnp.full(B, 0.2, jnp.float32)
ew = jnp.full(B, 2.0, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "use_rescore", "use_cols", "upk"),
)
def loop(qs_r, cbf, pw, pb, pd, nprobe, use_rescore, use_cols, upk):
    def body(carry, qb):
        v, i, cases, src = fused_partitioned_topk(
            qb, cent, prows, pint8, pscale,
            cbf if use_rescore else None,
            chunk_case, chunk_court, chunk_date,
            ct, dlo, dhi, tr, ts, chunk_case, msim, ew,
            k=K, nprobe=nprobe, overfetch=4, rescore_factor=4,
            recall_target=0.95,
            part_cword=pw if use_cols else None,
            part_cbit=pb if use_cols else None,
            part_date=pd if use_cols else None,
            use_probe_kernel=upk, probe_interpret=False,
        )
        return carry + v.sum(), i

    acc, idxs = jax.lax.scan(body, 0.0, qs_r)
    return acc, idxs


def run_variant(name, nprobe, use_rescore, use_cols, upk=True):
    def run(rv, t):
        return loop(qpools[rv][t], corpus_bf16, pcw, pcb, pdt,
                    nprobe, use_rescore, use_cols, upk)

    t0 = time.perf_counter()
    try:
        fetch_sync(run(R_LO, 0))
    except Exception as e:
        print(json.dumps({"config": name, "error": str(e)[:300]}))
        sys.stdout.flush()
        return
    compile_s = time.perf_counter() - t0
    ms = timed_slope(run, R_LO, R_HI, trials=TRIALS) * 1000
    print(json.dumps({
        "config": name, "nprobe": nprobe, "batch": B,
        "rescore": use_rescore, "precomputed_cols": use_cols,
        "probe_kernel": upk,
        "batch_ms": round(ms, 3), "qps": round(B / (ms / 1000), 1),
        "compile_s": round(compile_s, 1),
    }))
    sys.stdout.flush()


run_variant("full", 32, True, True)
run_variant("no_rescore", 32, False, True)
run_variant("derived_cols", 32, True, False)
run_variant("no_rescore_no_cols", 32, False, False)
run_variant("xla_probe_full", 32, True, True, upk=False)
print("done", file=sys.stderr)
