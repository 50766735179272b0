"""Deterministic synthetic multi-turn transcript tables (FIXTURES.md §F3).

BASELINE.json ``input_hint`` fixes the input shape: Parquet transcripts
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``. No such table exists in /root/testdata, so tests and
the bench synthesize it deterministically (seeded, stdlib+numpy only):

  * E canonical entity names from templated company-style strings — the
    shape of the reference's company-names workload
    (polyfuzz/datasets/_load_data.py:26-36, 100k entries);
  * 1-6 variants per entity via seeded edits (case flip, punctuation,
    suffix drop, typo, token swap), similarity-graded so linkage
    thresholds 0.6/0.75/0.8 split them predictably;
  * one conversation per (entity, variant): 2-8 turns, roles cycling
    user/assistant/tool, the variant planted in the turn-0 user text
    inside double quotes; rows SHUFFLED within the table so stable turn
    ordering must be re-established from ``turn_idx``;
  * the blocking key (first character of the cleaned mention) is made hot:
    ~30% of entities share one first letter — exercises skew handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.text import clean_string

ADJ = [
    "quick", "silver", "golden", "united", "global", "prime", "apex", "nova",
    "crystal", "summit", "atlas", "vertex", "luminous", "cobalt", "amber",
    "rapid", "bright", "coastal", "northern", "eastern", "pacific", "royal",
    "urban", "vivid", "zenith", "keystone", "iron", "emerald", "falcon",
    "granite", "harbor", "ivory",
]
HOT_ADJ = [
    "stellar", "sterling", "summit", "solar", "sapphire", "sequoia", "sierra",
    "southern", "spark", "spectrum", "stone", "storm", "strategic", "streamline",
]
NOUN = [
    "dynamics", "ventures", "logistics", "analytics", "networks", "industries",
    "solutions", "technologies", "capital", "energy", "foods", "motors",
    "robotics", "biotech", "media", "retail", "mining", "textiles", "freight",
    "materials", "optics", "semiconductors", "software", "pharma", "aviation",
    "marine", "agriculture", "telecom", "finance", "consulting", "builders",
    "labs",
]
SUFFIX = ["Inc", "LLC", "Ltd", "Corp", "Group", "Holdings", "Partners", "Co"]
TOOLS = [
    "search", "lookup", "calculator", "browser", "database", "translator",
    "summarizer", "scheduler",
]
FILLER = [
    "Let me check that for you.",
    "Here is what I found in the archive.",
    "Could you clarify the time range?",
    "The records were last updated recently.",
    "Running the requested query now.",
    "That matches the earlier report.",
    "I will summarize the findings below.",
    "The data source looks consistent.",
    "Please confirm the spelling of the name.",
    "Cross-referencing with the registry.",
]

EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (us)


def canonical_entity_names(n_entities: int, seed: int = 42) -> list[str]:
    """Deterministic distinct company-style names; ~30% drawn from a hot
    adjective pool sharing the first letter 's' (the hot blocking key).

    The word pools only yield ~11.7k distinct triples; beyond that,
    repeated triples get a deterministic numeric token appended
    (vectorized — no rejection loop, so any n_entities terminates)."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n_entities) < 0.30
    adj_hot = np.array(HOT_ADJ, dtype=object)[rng.integers(0, len(HOT_ADJ), n_entities)]
    adj_cold = np.array(ADJ, dtype=object)[rng.integers(0, len(ADJ), n_entities)]
    adjs = np.where(hot, adj_hot, adj_cold)
    nouns = np.array(NOUN, dtype=object)[rng.integers(0, len(NOUN), n_entities)]
    sufs = np.array(SUFFIX, dtype=object)[rng.integers(0, len(SUFFIX), n_entities)]
    names: list[str] = []
    counts: dict[str, int] = {}
    for a, n, s in zip(adjs.tolist(), nouns.tolist(), sufs.tolist()):
        base = f"{a.capitalize()} {n.capitalize()} {s}"
        k = counts.get(base, 0)
        counts[base] = k + 1
        names.append(base if k == 0 else f"{a.capitalize()} {n.capitalize()} {k + 1} {s}")
    return names


def _variant(name: str, op: int, rng: np.random.Generator) -> str:
    tokens = name.split()
    if op == 0:
        return name
    if op == 1:  # lowercase
        return name.lower()
    if op == 2:  # punctuation insert before suffix
        return " ".join(tokens[:-1]) + ", " + tokens[-1] + "."
    if op == 3:  # suffix drop
        return " ".join(tokens[:-1])
    if op == 4:  # adjacent-char typo in the longest token
        t = max(range(len(tokens)), key=lambda i: len(tokens[i]))
        w = tokens[t]
        if len(w) >= 4:
            i = int(rng.integers(1, len(w) - 2))
            w = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        tokens = tokens[:t] + [w] + tokens[t + 1:]
        return " ".join(tokens)
    if op == 5:  # token swap of the first two tokens
        if len(tokens) >= 3:
            tokens = [tokens[1], tokens[0]] + tokens[2:]
        return " ".join(tokens)
    if op == 6:  # uppercase
        return name.upper()
    return name


def entity_variants(
    names: list[str], seed: int = 42
) -> tuple[list[str], np.ndarray]:
    """For each canonical name emit 1-6 variants (first is always the
    canonical form). Returns (variants, entity_id per variant)."""
    rng = np.random.default_rng(seed + 1)
    variants: list[str] = []
    entity_ids: list[int] = []
    for eid, name in enumerate(names):
        n_var = int(rng.integers(1, 7))
        ops = [0] + list(rng.permutation([1, 2, 3, 4, 5, 6])[: n_var - 1])
        seen = set()
        for op in ops:
            v = _variant(name, int(op), rng)
            if v not in seen:
                seen.add(v)
                variants.append(v)
                entity_ids.append(eid)
    return variants, np.asarray(entity_ids, dtype=np.int64)


def generate_transcripts(
    n_entities: int, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Build (transcripts, ground_truth) Arrow tables.

    transcripts rows are shuffled with a seeded permutation; ground_truth is
    ``(conv_id, entity_id, canonical, variant, block_key)`` where block_key
    is the first character of the cleaned variant mention.
    """
    names = canonical_entity_names(n_entities, seed)
    variants, entity_ids = entity_variants(names, seed)
    rng = np.random.default_rng(seed + 2)

    conv_ids: list[str] = []
    gt_rows: list[tuple[str, int, str, str, str]] = []
    col_conv: list[str] = []
    col_turn: list[int] = []
    col_role: list[str] = []
    col_text: list[str] = []
    col_tool: list[str] = []
    col_ts: list[int] = []

    per_entity_counter: dict[int, int] = {}
    for seq, (variant, eid) in enumerate(zip(variants, entity_ids.tolist())):
        vidx = per_entity_counter.get(eid, 0)
        per_entity_counter[eid] = vidx + 1
        conv_id = f"c{eid:05d}-{vidx:03d}"
        cleaned = clean_string(variant)
        block_key = cleaned[0] if cleaned else "_"
        gt_rows.append((conv_id, eid, names[eid], variant, block_key))
        n_turns = int(rng.integers(2, 9))
        filler_idx = rng.integers(0, len(FILLER), size=n_turns)
        tool_idx = rng.integers(0, len(TOOLS), size=n_turns)
        for t in range(n_turns):
            role = ("user", "assistant", "tool")[t % 3]
            if t == 0:
                text = f'I need information about "{variant}" from the records.'
            else:
                text = FILLER[int(filler_idx[t])]
            col_conv.append(conv_id)
            col_turn.append(t)
            col_role.append(role)
            col_text.append(text)
            col_tool.append(TOOLS[int(tool_idx[t])] if role == "tool" else "")
            col_ts.append(EPOCH_US + seq * 3_600_000_000 + t * 7_000_000)

    n_rows = len(col_conv)
    perm = np.random.default_rng(seed + 3).permutation(n_rows)
    transcripts = pa.table(
        {
            "conv_id": pa.array(np.asarray(col_conv, dtype=object)[perm], type=pa.string()),
            "turn_idx": pa.array(np.asarray(col_turn, dtype=np.int32)[perm]),
            "role": pa.array(np.asarray(col_role, dtype=object)[perm], type=pa.string()),
            "text": pa.array(np.asarray(col_text, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(np.asarray(col_tool, dtype=object)[perm], type=pa.string()),
            "ts": pa.array(np.asarray(col_ts, dtype=np.int64)[perm], type=pa.timestamp("us")),
        }
    )
    ground_truth = pa.table(
        {
            "conv_id": pa.array([r[0] for r in gt_rows], type=pa.string()),
            "entity_id": pa.array([r[1] for r in gt_rows], type=pa.int64()),
            "canonical": pa.array([r[2] for r in gt_rows], type=pa.string()),
            "variant": pa.array([r[3] for r in gt_rows], type=pa.string()),
            "block_key": pa.array([r[4] for r in gt_rows], type=pa.string()),
        }
    )
    return transcripts, ground_truth


def labeled_pairs(ground_truth: pa.Table, seed: int = 42, neg_ratio: int = 5) -> pa.Table:
    """FIXTURES.md §F4: labeled pairs for the pairwise-F1 gate.

    Positives: all same-entity variant pairs within a block. Negatives: a
    seeded sample of cross-entity pairs within the same block, ~neg_ratio x
    the positive count.
    """
    import itertools

    gt = ground_truth.to_pandas()
    rng = np.random.default_rng(seed + 4)
    rows: list[tuple[str, str, str, bool]] = []
    for block, grp in gt.groupby("block_key"):
        by_entity: dict[int, list[str]] = {}
        for eid, var in zip(grp["entity_id"], grp["variant"]):
            by_entity.setdefault(int(eid), []).append(var)
        for eid, vars_ in by_entity.items():
            uniq = list(dict.fromkeys(vars_))
            for a, b in itertools.combinations(uniq, 2):
                rows.append((a, b, block, True))
    n_pos = len(rows)
    all_variants = gt[["variant", "entity_id", "block_key"]].drop_duplicates()
    # vectorized negative sampling: draw index pairs within random blocks,
    # filter same-entity collisions, repeat until the target is met
    by_block = {
        b: (
            g["variant"].to_numpy(dtype=object),
            g["entity_id"].to_numpy(dtype=np.int64),
        )
        for b, g in all_variants.groupby("block_key")
        if len(g) >= 2
    }
    blocks = list(by_block)
    target_neg = n_pos * neg_ratio
    n_neg = 0
    rounds = 0
    while n_neg < target_neg and rounds < 40 and blocks:
        rounds += 1
        want = target_neg - n_neg
        bidx = rng.integers(0, len(blocks), size=want)
        for b_i in np.unique(bidx):
            b = blocks[int(b_i)]
            variants_b, eids_b = by_block[b]
            k = int((bidx == b_i).sum())
            i = rng.integers(0, len(variants_b), size=k)
            j = rng.integers(0, len(variants_b), size=k)
            ok = eids_b[i] != eids_b[j]
            take = min(int(ok.sum()), target_neg - n_neg)
            if take <= 0:
                continue
            ii, jj = i[ok][:take], j[ok][:take]
            rows.extend(
                zip(
                    variants_b[ii].tolist(),
                    variants_b[jj].tolist(),
                    [b] * take,
                    [False] * take,
                )
            )
            n_neg += take
    return pa.table(
        {
            "entity_a": pa.array([r[0] for r in rows], type=pa.string()),
            "entity_b": pa.array([r[1] for r in rows], type=pa.string()),
            "block_key": pa.array([r[2] for r in rows], type=pa.string()),
            "is_match": pa.array([r[3] for r in rows], type=pa.bool_()),
        }
    )


def write_transcripts_dataset(
    out_dir: str, n_entities: int, seed: int = 42, shard_rows: int = 65_536
) -> dict:
    """Write transcripts + ground truth + labeled pairs as Parquet under
    ``out_dir`` (sharded so readers parallelize). Returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    transcripts, gt = generate_transcripts(n_entities, seed)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    n = transcripts.num_rows
    shard = 0
    for start in range(0, n, shard_rows):
        pq.write_table(
            transcripts.slice(start, shard_rows),
            os.path.join(tdir, f"part-{shard:05d}.parquet"),
        )
        shard += 1
    pq.write_table(gt, os.path.join(out_dir, "ground_truth.parquet"))
    pq.write_table(labeled_pairs(gt, seed), os.path.join(out_dir, "labeled_pairs.parquet"))
    return {
        "transcripts": tdir,
        "ground_truth": os.path.join(out_dir, "ground_truth.parquet"),
        "labeled_pairs": os.path.join(out_dir, "labeled_pairs.parquet"),
        "n_rows": n,
        "n_conversations": gt.num_rows,
    }
