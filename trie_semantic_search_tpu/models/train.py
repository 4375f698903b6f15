"""Contrastive training for the MiniLM encoder.

The reference treated its embedding model as a black-box ONNX artifact
(stubbed — ``/root/reference/src/vector.rs:162-181``). A TPU-native
framework owns the model, so it can *train* it: in-batch-negative InfoNCE
(the sentence-transformers recipe) over (anchor, positive) text pairs —
e.g. neighbouring sentences of the same opinion, or (case name, sentence)
pairs — which turns the deterministic random-init encoder into a corpus-
adapted semantic model with zero external downloads.

Sharding (SURVEY.md §2.1): data parallelism over the ``data`` mesh axis
(batch sharded, gradients psum'd by XLA) with optional tensor parallelism
over ``model`` (attention heads / FFN intermediate sharded via
``param_partition_specs``). The loss's all-pairs similarity matrix needs
every embedding in the batch, so embeddings are implicitly all-gathered
across ``data`` by XLA (the batch axis appears unsharded in the loss) —
exactly the communication a hand-written NCCL allgather would do, derived
from shardings instead.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from . import minilm

_log = logging.getLogger("tss_tpu.train")


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4
    weight_decay: float = 0.01
    temperature: float = 0.05
    warmup_steps: int = 100
    total_steps: int = 1000
    max_grad_norm: float = 1.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def info_nce_loss(
    anchors: jax.Array,  # [B, D] L2-normalised
    positives: jax.Array,  # [B, D] L2-normalised
    temperature: float,
    neg_mask: Optional[jax.Array] = None,  # [B, B] bool: True = usable negative
) -> tuple[jax.Array, jax.Array]:
    """Symmetric in-batch-negative InfoNCE. Returns (loss, accuracy).

    ``neg_mask[i, j]`` False excludes pair j as a negative for anchor i
    (the diagonal — the positive — is always kept). Duplicate-heavy
    corpora need this: when several in-batch items carry near-identical
    text, the task "pick YOUR duplicate among its twins" is unlearnable
    and measurably degrades the encoder below its random-projection init
    (bench_results/pretrain_lab_r03.jsonl)."""
    logits = anchors @ positives.T / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    if neg_mask is not None:
        keep = neg_mask | jnp.eye(logits.shape[0], dtype=bool)
        # -1e30 (not -inf): all-False rows would otherwise yield nan
        logits = jnp.where(keep, logits, -1e30)
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = (loss_a + loss_b).mean() / 2
    acc = (jnp.argmax(logits, axis=1) == labels).mean()
    return loss, acc


def train_step(
    params: minilm.Params,
    opt_state: optax.OptState,
    batch: dict[str, jax.Array],  # ids_a, mask_a, ids_b, mask_b  [B, L]
    model_config: minilm.MiniLMConfig,
    optimizer: optax.GradientTransformation,
    temperature: float,
) -> tuple[minilm.Params, optax.OptState, jax.Array, jax.Array]:
    """One InfoNCE step: returns (params, opt_state, loss, accuracy)."""

    def loss_fn(p: minilm.Params) -> tuple[jax.Array, jax.Array]:
        a = minilm.encode(p, batch["ids_a"], batch["mask_a"], model_config)
        b = minilm.encode(p, batch["ids_b"], batch["mask_b"], model_config)
        return info_nce_loss(a, b, temperature, batch.get("neg_mask"))

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, acc


def make_sharded_train_step(
    mesh: Mesh,
    model_config: minilm.MiniLMConfig,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
):
    """jit-compiled train step with explicit dp×tp shardings over ``mesh``.

    Params shard per :func:`minilm.param_partition_specs` (tensor parallel
    over ``model``); the batch shards over ``data``; XLA inserts the psum
    for gradients and the gather for the in-batch similarity matrix.
    """
    pspecs = minilm.param_partition_specs(model_config)
    param_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_sh = NamedSharding(mesh, P(DATA_AXIS, None))
    repl = NamedSharding(mesh, P())

    def _step(params, opt_state, batch):
        return train_step(
            params, opt_state, batch, model_config, optimizer, temperature
        )

    # Optimizer state mirrors param shardings leaf-for-leaf where shaped.
    def opt_sharding(tree):
        def per_leaf(x):
            return repl

        return jax.tree.map(per_leaf, tree)

    return jax.jit(
        _step,
        in_shardings=(param_sh, None, {k: batch_sh for k in
                                       ("ids_a", "mask_a", "ids_b", "mask_b")}),
        out_shardings=(param_sh, None, repl, repl),
        donate_argnums=(0, 1),
    )


# ---------------------------------------------------------------------------
# Pair mining + the offline pretraining loop
# ---------------------------------------------------------------------------


def mine_pairs(
    docs: Sequence[Sequence[str]],  # per-document sentence lists
    seed: int = 0,
    scrub_digits: bool = False,
) -> list[tuple[str, str]]:
    """Self-supervised pairs: adjacent sentences of the same document
    (positives) — the classic "neighbouring spans agree" signal.

    ``scrub_digits`` replaces digit runs with ``0`` in the TRAINING pair
    text (serving still embeds raw text). Document-unique numbers (case /
    docket / trial numbers) are a shortcut that lets InfoNCE reach ~100%
    in-batch accuracy without learning any semantics — measured to DEGRADE
    retrieval below the random init (pretrain_lab_r03.jsonl); scrubbing
    leaves topic/doctrine tokens as the only match signal, which is the
    representation retrieval actually needs. It also makes template twins
    verbatim-identical, so the false-negative jaccard mask catches them."""
    import re

    rng = np.random.default_rng(seed)
    pairs: list[tuple[str, str]] = []
    for sents in docs:
        if scrub_digits:
            sents = [re.sub(r"\d+", "0", s) for s in sents]
        for i in range(len(sents) - 1):
            pairs.append((sents[i], sents[i + 1]))
        if len(sents) >= 3:  # long-range pair for document-level coherence
            i, j = rng.choice(len(sents), 2, replace=False)
            pairs.append((sents[i], sents[j]))
    rng.shuffle(pairs)  # type: ignore[arg-type]
    return pairs


#: training-augmentation synonym lexicon: public-knowledge English/legal
#: synonym groups used ONLY to generate augmented views for contrastive
#: pretraining (:func:`mine_view_pairs`). It is curated independently of
#: the evaluation lexicon (``models.quality.SYNONYMS``), but both draw on
#: the same public domain knowledge so some pairs coincide;
#: scripts/r4_view_lab.py also measures with the overlap REMOVED so the
#: generalisation claim does not rest on shared entries.
TRAIN_SYNONYM_GROUPS: list[list[str]] = [
    ["attorney", "lawyer", "counsel", "advocate"],
    ["judge", "justice", "jurist"],
    ["court", "tribunal", "forum"],
    ["ruling", "judgment", "decision", "holding"],
    ["law", "statute", "enactment"],
    ["regulation", "rule", "ordinance"],
    ["contract", "agreement", "pact"],
    ["evidence", "proof", "testimony"],
    ["defendant", "accused", "respondent"],
    ["plaintiff", "petitioner", "claimant", "complainant"],
    ["crime", "offense", "felony"],
    ["illegal", "unlawful", "illicit"],
    ["forbidden", "prohibited", "banned", "barred"],
    ["permitted", "allowed", "authorized"],
    ["obligation", "duty", "responsibility"],
    ["damages", "compensation", "restitution"],
    ["appeal", "review", "rehearing"],
    ["reversed", "overturned", "vacated"],
    ["affirmed", "upheld", "sustained"],
    ["remanded", "returned"],
    ["dismissed", "rejected", "denied"],
    ["decided", "held", "concluded", "determined", "ruled", "found",
     "reasoned"],
    ["dispute", "controversy", "disagreement"],
    ["doctrine", "principle", "precept"],
    ["framework", "structure", "scheme"],
    ["standard", "test", "criterion"],
    ["analysis", "examination", "inquiry"],
    ["claim", "assertion", "contention"],
    ["record", "transcript", "file"],
    ["trial", "proceeding", "hearing"],
    ["question", "issue", "matter"],
    ["car", "automobile", "vehicle"],
    ["house", "home", "residence", "dwelling"],
    ["money", "funds", "payment"],
    ["big", "large", "substantial"],
    ["small", "minor", "trivial"],
    ["begin", "start", "commence"],
    ["end", "finish", "terminate", "conclude"],
    ["show", "demonstrate", "establish"],
    ["require", "demand", "mandate"],
    ["sensible", "reasonable", "rational"],
    ["acquired", "obtained", "procured"],
    ["applies", "governs", "controls"],
]

#: word → candidate replacements (every other member of its group)
TRAIN_SYNONYMS: dict[str, list[str]] = {}
for _grp in TRAIN_SYNONYM_GROUPS:
    for _w in _grp:
        TRAIN_SYNONYMS.setdefault(_w, []).extend(
            x for x in _grp if x != _w
        )

_VIEW_STOPWORDS = frozenset(
    "the a an of in on at to and or is was were be been that this it its by "
    "for with as from".split()
)


def augment_view(
    sentence: str,
    rng: np.random.Generator,
    synonyms: Optional[dict[str, list[str]]] = None,
    swap_prob: float = 0.9,
    drop_prob: float = 0.3,
    scrub_digits: bool = True,
) -> str:
    """One stochastic meaning-preserving rewrite: synonym swaps (per
    occurrence, ``swap_prob``), stopword drops (``drop_prob``), digit
    scrubbing. Two independent draws of this over the SAME sentence form
    an unambiguous positive pair — the augmentation teaches the token
    embeddings lexicon invariance directly."""
    import re

    syn = TRAIN_SYNONYMS if synonyms is None else synonyms
    out: list[str] = []
    for w in sentence.split():
        core = w.lower().strip(".,;:()")
        if core in syn and rng.random() < swap_prob:
            out.append(str(rng.choice(syn[core])))
        elif core in _VIEW_STOPWORDS and rng.random() < drop_prob:
            continue
        else:
            out.append(w)
    s = " ".join(out)
    if scrub_digits:
        s = re.sub(r"\d+", "0", s)
    return s


def mine_view_pairs(
    docs: Sequence[Sequence[str]],
    seed: int = 0,
    synonyms: Optional[dict[str, list[str]]] = None,
    scrub_digits: bool = True,
    views_per_sentence: int = 1,
) -> list[tuple[str, str]]:
    """Augmentation-view positives (round-3 VERDICT item 6): each pair is
    two INDEPENDENT :func:`augment_view` draws of the same sentence.
    Unlike adjacent-sentence pairs (:func:`mine_pairs`), the positive
    relation is unambiguous, so template-heavy corpora cannot poison the
    loss with false in-batch negatives — the trap that made round-3
    adjacent-pair pretraining DEGRADE retrieval below random init."""
    rng = np.random.default_rng(seed)
    pairs: list[tuple[str, str]] = []
    for sents in docs:
        for s in sents:
            for _ in range(views_per_sentence):
                a = augment_view(s, rng, synonyms, scrub_digits=scrub_digits)
                b = augment_view(s, rng, synonyms, scrub_digits=scrub_digits)
                if a and b:
                    pairs.append((a, b))
    rng.shuffle(pairs)  # type: ignore[arg-type]
    return pairs


def _false_negative_mask(
    texts: Sequence[str], jaccard_threshold: float
) -> np.ndarray:
    """[B, B] bool — True where pair j is a USABLE negative for anchor i:
    token-set Jaccard below the threshold. Template/boilerplate corpora
    put near-verbatim items in every batch; treating a twin as a negative
    is a false label the loss then optimises against."""
    sets = [frozenset(t.lower().split()) for t in texts]
    B = len(sets)
    mask = np.ones((B, B), dtype=bool)
    for i in range(B):
        si = sets[i]
        for j in range(i + 1, B):
            sj = sets[j]
            inter = len(si & sj)
            union = len(si | sj) or 1
            if inter / union >= jaccard_threshold:
                mask[i, j] = mask[j, i] = False
    return mask


def batches_from_pairs(
    pairs: Sequence[tuple[str, str]],
    tokenizer,
    batch_size: int,
    max_len: int,
    seed: int = 0,
    false_negative_jaccard: float = 0.0,
) -> Iterator[dict[str, jnp.ndarray]]:
    """Cycle tokenised [B, L] batches forever (caller bounds steps).

    ``false_negative_jaccard`` > 0 adds a ``neg_mask`` [B, B] excluding
    near-duplicate in-batch negatives (token-set Jaccard ≥ threshold on
    the concatenated pair text) — see :func:`info_nce_loss`."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(pairs))
    while True:
        rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[s : s + batch_size]
            a = tokenizer.encode_batch([pairs[i][0] for i in idx], max_len)
            b = tokenizer.encode_batch([pairs[i][1] for i in idx], max_len)
            batch = {
                "ids_a": jnp.asarray(a.input_ids),
                "mask_a": jnp.asarray(a.attention_mask),
                "ids_b": jnp.asarray(b.input_ids),
                "mask_b": jnp.asarray(b.attention_mask),
            }
            if false_negative_jaccard > 0.0:
                batch["neg_mask"] = jnp.asarray(_false_negative_mask(
                    [pairs[i][0] + " " + pairs[i][1] for i in idx],
                    false_negative_jaccard,
                ))
            yield batch


def pretrain_encoder(
    embedder,  # models.embedder.Embedder (params updated in place)
    docs: Sequence[Sequence[str]],
    steps: int = 200,
    batch_size: int = 32,
    max_len: int = 64,
    train_config: Optional[TrainConfig] = None,
    log_every: int = 50,
    false_negative_jaccard: float = 0.0,
    scrub_digits: bool = False,
    pair_style: str = "adjacent",  # "adjacent" | "views"
) -> dict:
    """Corpus-contrastive pretraining: adapts the encoder to the corpus so
    semantic search is meaningful with zero downloaded weights.

    ``false_negative_jaccard`` > 0 masks near-duplicate in-batch
    negatives (see :func:`info_nce_loss`) — essential on template-heavy
    corpora, where unmasked training measurably degrades retrieval below
    the random init."""
    cfg = train_config or TrainConfig(total_steps=steps)
    if pair_style == "views":
        pairs = mine_view_pairs(docs, scrub_digits=scrub_digits)
    else:
        pairs = mine_pairs(docs, scrub_digits=scrub_digits)
    if len(pairs) < 4:
        _log.warning(
            "only %d pairs (< 4); skipping pretraining", len(pairs)
        )
        return {"steps": 0, "pairs": len(pairs)}
    # shrink the batch for small corpora (InfoNCE needs >=2 in-batch
    # negatives; below the requested batch we still train, just smaller)
    batch_size = min(batch_size, len(pairs))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(embedder.params)
    step_fn = jax.jit(
        partial(
            train_step,
            model_config=embedder.model_config,
            optimizer=optimizer,
            temperature=cfg.temperature,
        )
    )
    params = embedder.params
    it = batches_from_pairs(
        pairs, embedder.tokenizer, batch_size, max_len,
        false_negative_jaccard=false_negative_jaccard,
    )
    last_loss = last_acc = float("nan")
    for step in range(steps):
        batch = next(it)
        params, opt_state, loss, acc = step_fn(params, opt_state, batch)
        if (step + 1) % log_every == 0 or step == steps - 1:
            last_loss, last_acc = float(loss), float(acc)
            _log.info(
                "pretrain step %d/%d: loss=%.4f acc=%.3f",
                step + 1, steps, last_loss, last_acc,
            )
    embedder.params = params
    return {
        "steps": steps,
        "pairs": len(pairs),
        "final_loss": last_loss,
        "final_accuracy": last_acc,
    }


def pretrain_encoder_guarded(
    embedder,  # models.embedder.Embedder (params updated in place)
    docs: Sequence[Sequence[str]],
    steps: int = 200,
    batch_size: int = 32,
    max_len: int = 64,
    train_config: Optional[TrainConfig] = None,
    false_negative_jaccard: float = 0.5,
    scrub_digits: bool = True,
    eval_docs: int = 64,
    eval_probes: int = 96,
    pair_style: str = "views",
) -> dict:
    """Pretrain with a retrieval guardrail: keep the trained weights only
    if they do NOT degrade probe retrieval vs the initialisation.

    Why: a random-init MiniLM is already a strong bag-of-words retriever
    (random projections preserve token-overlap geometry). On degenerate
    corpora — heavy boilerplate, template text — corpus-contrastive
    InfoNCE can reach ~100% in-batch accuracy through shortcuts and
    COLLAPSE that geometry: measured on the round-3 CAP corpus, 300
    unguarded steps halved direct-retrieval MRR (0.42 → 0.22;
    bench_results/pretrain_lab_r03.jsonl — false-negative masking and
    digit scrubbing, both on by default here, recover only part of it).
    The guardrail makes pretraining corpus-agnostic: corpora where the
    objective helps keep the trained weights, degenerate ones keep init.

    Returns the pretrain report plus a ``guardrail`` record with both
    measurements and which weights were kept."""
    from .quality import build_probes, evaluate_embedder_direct

    init_params = embedder.params  # immutable jax arrays: snapshot = ref
    rep = pretrain_encoder(
        embedder, docs, steps=steps, batch_size=batch_size,
        max_len=max_len, train_config=train_config,
        false_negative_jaccard=false_negative_jaccard,
        scrub_digits=scrub_digits, pair_style=pair_style,
    )
    if not rep.get("steps"):
        return rep  # pretraining skipped (tiny corpus)
    sample = [(i, sents) for i, sents in enumerate(docs[:eval_docs])]
    probes = build_probes(sample, max_probes=eval_probes)
    texts: list[str] = []
    rows: list[int] = []
    for i, sents in sample:
        for s in sents[:8]:
            texts.append(s)
            rows.append(i)
    if not probes or not texts:
        rep["guardrail"] = {"kept": "trained", "reason": "no probes"}
        return rep
    trained_params = embedder.params
    trained = evaluate_embedder_direct(embedder, texts, rows, probes)["all"]
    embedder.params = init_params
    init = evaluate_embedder_direct(embedder, texts, rows, probes)["all"]
    if trained["mrr"] >= init["mrr"]:
        embedder.params = trained_params
        kept = "trained"
    else:  # init already restored
        kept = "init"
        _log.warning(
            "pretraining degraded probe retrieval (MRR %.3f -> %.3f); "
            "keeping the initialisation weights",
            init["mrr"], trained["mrr"],
        )
    rep["guardrail"] = {
        "kept": kept,
        "trained_mrr": trained["mrr"],
        "init_mrr": init["mrr"],
        "probes": len(probes),
    }
    return rep


def select_pooling_guarded(
    embedder,  # models.embedder.Embedder (token_weights set in place)
    docs: Sequence[Sequence[str]],
    sif_a: float = 0.1,
    eval_docs: int = 64,
    eval_probes: int = 96,
    count_sentences: int = 50_000,
    force: Optional[str] = None,  # "mean" | "sif" skips the comparison
) -> dict:
    """Pick the pooling mode on probe merit (round-3 VERDICT item 6).

    Computes SIF weights (``minilm.sif_weights_from_counts``) from a
    bounded tokenize-only pass over ``docs``, evaluates the encoder under
    plain mean pooling vs SIF pooling on held-out probes, and leaves the
    WINNER set on the embedder — the same keep-on-merit contract as
    :func:`pretrain_encoder_guarded`. Measured on the CAP-style corpus:
    mild SIF (a=0.1) edges plain (direct MRR 0.5615 vs 0.5504, recall@10
    0.85 vs 0.80, scripts/r4_sif_lab.py) while aggressive weighting
    (a<=0.01, idf) loses badly — hence the merit gate instead of a static
    default. Runs BEFORE pretraining so the pretrain guardrail evaluates
    under the pooling that will actually serve."""
    import itertools

    from .minilm import count_token_ids, sif_weights_from_counts
    from .quality import build_probes, evaluate_embedder_direct

    vocab_size = max(len(embedder.tokenizer), 128)
    counts = count_token_ids(
        embedder.tokenizer,
        itertools.islice((s for sents in docs for s in sents),
                         count_sentences),
        vocab_size=vocab_size,
    )
    weights = sif_weights_from_counts(counts, a=sif_a)
    if force == "sif":
        embedder.set_token_weights(weights)
        return {"pooling": "sif", "sif_a": sif_a, "forced": True}
    if force == "mean":
        embedder.set_token_weights(None)
        return {"pooling": "mean", "forced": True}

    sample = [(i, sents) for i, sents in enumerate(docs[:eval_docs])]
    probes = build_probes(sample, max_probes=eval_probes)
    texts: list[str] = []
    rows: list[int] = []
    for i, sents in sample:
        for s in sents[:8]:
            texts.append(s)
            rows.append(i)
    if len(probes) < 8 or not texts:
        embedder.set_token_weights(None)
        return {"pooling": "mean", "reason": "corpus too small for probes"}
    embedder.set_token_weights(None)
    mean_m = evaluate_embedder_direct(embedder, texts, rows, probes)["all"]
    embedder.set_token_weights(weights)
    sif_m = evaluate_embedder_direct(embedder, texts, rows, probes)["all"]
    if sif_m["mrr"] > mean_m["mrr"]:
        kept = "sif"  # weights already set
    else:
        kept = "mean"
        embedder.set_token_weights(None)
    rec = {
        "pooling": kept, "sif_a": sif_a,
        "mean_mrr": mean_m["mrr"], "sif_mrr": sif_m["mrr"],
        "probes": len(probes),
    }
    _log.info("pooling selection: %s", rec)
    return rec
