"""Deterministic synthetic data generators (FIXTURES.md F1–F5).

No external data: everything derives from ``np.random.default_rng(seed)``.
Given the same (seed, size) arguments these produce byte-identical tables.

- ``gen_entities``      → entity registry (sense_id, title, kind)   [F4 feed]
- ``gen_link_corpus``   → anchor-occurrence corpus                  [F3]
- ``gen_transcripts``   → transcripts + ground-truth clusters       [F1, F2]

Planted structure for entity resolution: each ground-truth cluster is a base
conversation plus 0–4 perturbed duplicates (token typos, synonym swaps, turn
truncation, template paraphrase, re-stamped conv_id/ts). Turn texts embed
entity-name mentions drawn from the link corpus's label vocabulary so anchor
features are meaningful (SURVEY.md §5.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SYLLABLES = [
    "ac", "bel", "cor", "dan", "el", "for", "gal", "hel", "ins", "jor",
    "kal", "lum", "mer", "nov", "or", "pax", "quil", "ros", "syn", "tor",
    "ul", "ver", "wex", "xen", "yor", "zan",
]
_KINDS = ["corp", "labs", "systems", "group", "works"]

_FILLER = (
    "please can you check the status of our order and let me know when it "
    "ships also we need an update on the invoice from last week thanks for "
    "your help with this matter the team will review and respond shortly "
    "regarding the contract renewal we should schedule a call to discuss "
    "pricing options and delivery timelines before the end of the quarter"
).split()

_SYNONYMS = {
    "check": "verify", "order": "purchase", "ships": "dispatches",
    "update": "report", "invoice": "bill", "help": "assistance",
    "review": "evaluate", "respond": "reply", "call": "meeting",
    "discuss": "negotiate", "pricing": "cost", "delivery": "shipment",
}

_ROLES = ["user", "assistant"]
_TOOLS = ["", "search", "lookup", "calculator"]

_TEMPLATES = [
    "hello i am contacting you about {e} we {f}",
    "this conversation concerns {e} and specifically {f}",
    "as discussed {f} the account for {e} remains open",
    "following up on {e} since {f}",
    "note that {e} mentioned {f} yesterday",
]

_BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


def gen_entities(n_entities: int, seed: int) -> pa.Table:
    """Entity registry: sense_id, title, kind (FIXTURES.md F4 feed / D5)."""
    rng = np.random.default_rng(seed)
    titles, kinds = [], []
    seen = set()
    while len(titles) < n_entities:
        n_syl = rng.integers(2, 4)
        name = "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))
        kind = _KINDS[rng.integers(0, len(_KINDS))]
        title = f"{name} {kind}"
        if title in seen:
            continue
        seen.add(title)
        titles.append(title)
        kinds.append(kind)
    return pa.table(
        {
            "sense_id": pa.array(np.arange(n_entities, dtype=np.int64)),
            "title": pa.array(titles, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        }
    )


def gen_link_corpus(
    entities: pa.Table, n_docs: int, seed: int, ambiguous_frac: float = 0.2
) -> pa.Table:
    """Anchor-occurrence corpus (FIXTURES.md F3).

    Per doc: a handful of (label, sense_id) link occurrences plus plain-text
    occurrences (sense_id = -1). Zipfian entity popularity; a fraction of
    labels is ambiguous (shared by 2 senses with skewed commonness) so
    commonness-ranking tests are non-trivial (reference M4/M5 semantics).
    Labels include the full title, the bare name (title minus kind — the
    ambiguous surface), and an occasional uppercase variant (normalization).
    """
    rng = np.random.default_rng(seed + 1)
    titles = entities["title"].to_pylist()
    n_ent = len(titles)
    # Zipfian popularity over entities
    pop = 1.0 / np.arange(1, n_ent + 1) ** 1.1
    pop /= pop.sum()
    # ambiguous surface: bare name of entity i also points at entity (i+1)%n
    bare = [t.rsplit(" ", 1)[0] for t in titles]
    doc_ids, labels, sense_ids, from_title, from_redirect = [], [], [], [], []

    def emit(d: int, lab: str, s: int, ft: bool, fr: bool) -> None:
        doc_ids.append(d)
        labels.append(lab)
        sense_ids.append(s)
        from_title.append(ft)
        from_redirect.append(fr)

    n_amb = int(n_ent * ambiguous_frac)
    for d in range(n_docs):
        k = rng.integers(2, 6)
        ents = rng.choice(n_ent, size=k, p=pop)
        for e in ents:
            e = int(e)
            r = rng.random()
            if r < 0.6:
                emit(d, titles[e], e, True, False)
            elif r < 0.9:
                # bare-name anchor; for the first n_amb entities this surface
                # is ambiguous: 75% dominant sense e, 25% sense (e+1)%n_ent
                target = e
                if e < n_amb and rng.random() < 0.25:
                    target = (e + 1) % n_ent
                emit(d, bare[e], target, False, False)
            else:
                emit(d, titles[e].upper(), e, False, True)  # redirect-ish variant
        # plain-text (unlinked) occurrences → drives linkProbability < 1
        for e in ents[: max(1, k // 2)]:
            e = int(e)
            lab = titles[e] if rng.random() < 0.5 else bare[e]
            emit(d, lab, -1, False, False)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "label": pa.array(labels, pa.string()),
            "sense_id": pa.array(np.asarray(sense_ids, dtype=np.int64)),
            "from_title": pa.array(from_title, pa.bool_()),
            "from_redirect": pa.array(from_redirect, pa.bool_()),
        }
    )


_TRANS_LANGS = ["de", "es", "fr", "it", "nl"]


def gen_translations(entities: pa.Table, seed: int) -> pa.Table:
    """J5 side table: per-sense translated titles (reference D7 —
    ``WpmLoader.load_translations``: page_id → {langcode: title}).

    Deterministic: each (sense, lang) pair is present with p≈0.7 under the
    fixture rng; the "translation" is a marker-prefixed word reversal of
    the title (no external data). Column named ``trans_title`` (not
    ``title``) so the enrichment join needs no rename."""
    rng = np.random.default_rng(seed + 7)
    sense_ids = entities["sense_id"].to_numpy()
    titles = entities["title"].to_pylist()
    present = rng.random((len(titles), len(_TRANS_LANGS))) < 0.7
    out_sid, out_lang, out_title = [], [], []
    for i, title in enumerate(titles):
        flipped = " ".join(reversed(title.split(" ")))
        for j, lang in enumerate(_TRANS_LANGS):
            if present[i, j]:
                out_sid.append(int(sense_ids[i]))
                out_lang.append(lang)
                out_title.append(f"{lang}:{flipped}")
    return pa.table(
        {
            "sense_id": pa.array(np.asarray(out_sid, dtype=np.int64)),
            "lang": pa.array(out_lang, pa.string()),
            "trans_title": pa.array(out_title, pa.string()),
        }
    )


def gen_pageviews(entities: pa.Table, seed: int, n_days: int = 14) -> pa.Table:
    """F4 side table: daily page-view counts per sense (reference
    ``StatisticsProcessor``: external per-article view statistics —
    recast as a Parquet fact table, no external service).

    Zipfian per-entity base rate × a shared daily factor, Poisson counts;
    fully vectorized. ``day`` is an int32 day index (0 = oldest) so the
    trend split (first week vs second week) is oracle-trivial."""
    rng = np.random.default_rng(seed + 11)
    n_ent = entities.num_rows
    base = 1000.0 / np.arange(1, n_ent + 1) ** 1.05
    daily = 0.8 + 0.4 * rng.random(n_days)
    views = rng.poisson(np.outer(base, daily))
    return pa.table(
        {
            "sense_id": pa.array(
                np.repeat(entities["sense_id"].to_numpy(), n_days)
            ),
            "day": pa.array(
                np.tile(np.arange(n_days, dtype=np.int32), n_ent)
            ),
            "views": pa.array(views.reshape(-1).astype(np.int64)),
        }
    )


def _make_turn_text(rng: np.random.Generator, entity_title: str) -> str:
    tmpl = _TEMPLATES[rng.integers(0, len(_TEMPLATES))]
    n_f = rng.integers(8, 20)
    filler = " ".join(rng.choice(_FILLER) for _ in range(n_f))
    return tmpl.format(e=entity_title, f=filler)


def _perturb_text(rng: np.random.Generator, text: str) -> str:
    """Typos + synonym swaps on a few tokens; keeps ~90% of chars intact."""
    words = text.split()
    out = []
    for w in words:
        r = rng.random()
        if r < 0.05 and w in _SYNONYMS:
            out.append(_SYNONYMS[w])
        elif r < 0.08 and len(w) > 3:
            i = int(rng.integers(1, len(w) - 1))
            mode = rng.random()
            if mode < 0.5:  # swap adjacent chars
                w = w[: i - 1] + w[i] + w[i - 1] + w[i + 1 :]
            else:  # drop a char
                w = w[:i] + w[i + 1 :]
            out.append(w)
        else:
            out.append(w)
    return " ".join(out)


def gen_transcripts(
    n_convs: int,
    seed: int,
    dup_rate: float = 0.35,
    entities: pa.Table | None = None,
) -> tuple[pa.Table, pa.Table]:
    """Transcripts (F1) + ground-truth clusters (F2).

    ``n_convs`` counts TOTAL conversations (bases + duplicates). A fraction
    ``dup_rate`` of conversations are perturbed duplicates of a base
    conversation; cluster_id is the min conv_id of the cluster. Output rows
    are sorted by (conv_id, turn_idx); conv ids are zero-padded so
    lexicographic min == numeric min (canonical cluster labels).
    """
    rng = np.random.default_rng(seed + 2)
    if entities is None:
        entities = gen_entities(max(50, n_convs // 20), seed)
    titles = entities["title"].to_pylist()

    # Build cluster plan: sequence of cluster sizes summing to n_convs
    sizes: list[int] = []
    remaining = n_convs
    while remaining > 0:
        if rng.random() < dup_rate and remaining >= 2:
            s = int(min(remaining, rng.integers(2, 6)))
        else:
            s = 1
        sizes.append(s)
        remaining -= s

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[np.datetime64] = []
    truth_conv: list[str] = []
    truth_cluster: list[str] = []

    width = max(6, len(str(n_convs)))
    next_id = 0

    def cid(i: int) -> str:
        return f"c{i:0{width}d}"

    for size in sizes:
        n_turns = int(rng.integers(3, 21))
        ent_pool = rng.choice(len(titles), size=max(1, n_turns // 4) + 1)
        base_turns = []
        for t in range(n_turns):
            ent = titles[int(ent_pool[t % len(ent_pool)])]
            base_turns.append(
                (
                    _ROLES[t % 2],
                    _make_turn_text(rng, ent),
                    _TOOLS[rng.integers(0, len(_TOOLS))] if t % 2 == 1 else "",
                )
            )
        member_ids = [cid(next_id + m) for m in range(size)]
        cluster_id = member_ids[0]
        for m, conv in enumerate(member_ids):
            if m == 0:
                turns = base_turns
            else:
                # perturbed duplicate: optional truncation + per-turn noise
                keep = n_turns
                if n_turns > 4 and rng.random() < 0.3:
                    keep = int(rng.integers(max(3, n_turns - 3), n_turns + 1))
                turns = [
                    (role, _perturb_text(rng, text), tool)
                    for role, text, tool in base_turns[:keep]
                ]
            t0 = _BASE_TS + np.timedelta64(int(rng.integers(0, 10**9)), "s").astype(
                "timedelta64[us]"
            )
            for t, (role, text, tool) in enumerate(turns):
                conv_ids.append(conv)
                turn_idxs.append(t)
                roles.append(role)
                texts.append(text)
                tools.append(tool)
                tss.append(t0 + np.timedelta64(t * 30, "s").astype("timedelta64[us]"))
            truth_conv.append(conv)
            truth_cluster.append(cluster_id)
        next_id += size

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(np.asarray(turn_idxs, dtype=np.int32)),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(np.asarray(tss), pa.timestamp("us")),
        }
    )
    truth = pa.table(
        {
            "conv_id": pa.array(truth_conv, pa.string()),
            "cluster_id": pa.array(truth_cluster, pa.string()),
        }
    )
    return transcripts, truth


def build_labeled_pairs(
    pairs_df, truth_df, seed: int = 42
) -> "pa.Table":
    """FIXTURES.md F5: labeled pairs = candidate pairs sharing a blocking
    key (the north_rule F1 population) × ground truth.

    ``pairs_df``: pandas with conv_a, conv_b, block_id (stage-1 output);
    ``truth_df``: pandas with conv_id, cluster_id.
    """
    tmap = dict(zip(truth_df["conv_id"], truth_df["cluster_id"]))
    is_match = [
        tmap.get(a) == tmap.get(b)
        for a, b in zip(pairs_df["conv_a"], pairs_df["conv_b"])
    ]
    return pa.table(
        {
            "conv_a": pa.array(list(pairs_df["conv_a"]), pa.string()),
            "conv_b": pa.array(list(pairs_df["conv_b"]), pa.string()),
            "block_id": pa.array(list(pairs_df["block_id"]), pa.string()),
            "is_match": pa.array(is_match, pa.bool_()),
        }
    )


def write_fixture_set(out_dir: str, n_convs: int, seed: int = 42) -> dict[str, str]:
    """Write the full fixture set under ``out_dir``; returns path map."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    entities = gen_entities(max(50, n_convs // 20), seed)
    corpus = gen_link_corpus(entities, n_docs=max(200, n_convs * 2), seed=seed)
    transcripts, truth = gen_transcripts(n_convs, seed, entities=entities)
    paths = {}
    for name, tbl in [
        ("entities", entities),
        ("link_corpus", corpus),
        ("transcripts", transcripts),
        ("clusters_truth", truth),
        ("translations", gen_translations(entities, seed)),
        ("pageviews", gen_pageviews(entities, seed)),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # big tables shard into a directory of part files (readers accept
        # both layouts): Parquet reads parallelize per FILE first and per
        # row group second — a single 1M-row file with pyarrow's default
        # row grouping was measured reading serially (~20 s stall at the
        # 100k-conversation bench tier). Small tables stay single-file.
        if tbl.num_rows > 200_000:
            import shutil

            tmp = p + ".tmp-dir"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            part_rows = 131_072
            for i, lo in enumerate(range(0, tbl.num_rows, part_rows)):
                pq.write_table(
                    tbl.slice(lo, part_rows),
                    os.path.join(tmp, f"part-{i:04d}.parquet"),
                    row_group_size=32768,
                )
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)
            os.replace(tmp, p)
        else:
            pq.write_table(tbl, p, row_group_size=32768)
        paths[name] = p
    # record the seed so on-demand regeneration (catalog._side_table for
    # pre-r4 dirs) uses the seed this dir was actually built with
    import json

    mtmp = os.path.join(out_dir, f".fixture_manifest.json.tmp{os.getpid()}")
    with open(mtmp, "w") as f:
        json.dump({"seed": seed, "n_convs": n_convs}, f)
    os.replace(mtmp, os.path.join(out_dir, "fixture_manifest.json"))
    return paths


def gen_embeddings_with_neardups(
    n_base: int = 200, n_dups: int = 12, dim: int = 24, seed: int = 42
) -> pa.Table:
    """Embedding table with PLANTED near-duplicates: ``n_base`` well-spread
    base vectors (scaled standard normal — pairwise cosine stays far below
    any near-dup threshold w.h.p.) plus ``n_dups`` tiny perturbations of the
    first ``n_dups`` base rows (cosine ≈ 1 with their source). The synthetic
    ``embeddings.parquet`` testdata has NO true near-dups (max pairwise
    cosine ≈ 0.48), so near-dup recall gates need this fixture.

    Output: (vec_id int64, embedding list<double>); dup of base i has
    vec_id = n_base + i."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim)) * 4.0
    dups = base[:n_dups] + 1e-4 * rng.standard_normal((n_dups, dim))
    vecs = np.vstack([base, dups])
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
