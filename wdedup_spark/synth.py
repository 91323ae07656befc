"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2/F5).

Produces the primary input table of the graft — multi-turn conversation
transcripts with schema per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — with planted duplicate classes:

  D0 exact      — byte-identical copy under a new conv_id (the reference's
                  exact-duplicate semantic: equal keys collapse,
                  /root/reference/src/wmerge.cpp:124-127)
  D1 near-edit  — 1-5%% token substitutions spread across turns (MinHash/LSH)
  D2 bit-flip   — a few single-character edits (SimHash Hamming path)
  D3 substring  — two distinct convs sharing one >=200-token verbatim span
                  (suffix-array pass; MinHash similarity below threshold)
  D4 reorder    — same rows emitted out of order with correct turn_idx
                  (must dedup identically — tests stable turn ordering);
                  D4X variant with *permuted indices* must NOT match
  D5 singleton  — unique conversations (negative class)

All randomness flows from one seeded numpy Generator — two calls with the
same arguments produce byte-identical tables (the determinism contract the
reference gets from its deterministic merge planner,
/root/reference/include/wdedup.hpp:114-116).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator", "file_io", "sql"]
BASE_TS = np.datetime64("2026-01-01T00:00:00")


def _vocab(n: int = 2500) -> np.ndarray:
    """Seed-free synthetic vocabulary: pronounceable-ish unique tokens."""
    cons = "bcdfghjklmnpqrstvwz"
    vow = "aeiou"
    words = []
    i = 0
    while len(words) < n:
        a, b, c = cons[i % 19], vow[(i // 19) % 5], cons[(i // 95) % 19]
        d, e = vow[(i // 1805) % 5], cons[(i // 9025) % 19]
        words.append(f"{a}{b}{c}{d}{e}{i % 97}")
        i += 1
    return np.array(words)


@dataclass
class SynthResult:
    transcripts: pd.DataFrame
    oracle_pairs: pd.DataFrame
    meta: dict = field(default_factory=dict)


def _zipf_text(rng: np.random.Generator, vocab: np.ndarray, n_tokens: int) -> list[str]:
    # Zipf-ish over the vocab: rank r has weight 1/(r+10)
    ranks = rng.zipf(1.35, size=n_tokens) % len(vocab)
    return vocab[ranks].tolist()


def _edit_tokens(rng: np.random.Generator, tokens: list[str], vocab: np.ndarray, frac: float) -> list[str]:
    """Substitute ~frac of tokens (D1 near-edit)."""
    out = list(tokens)
    n_edit = max(1, int(len(out) * frac))
    idx = rng.choice(len(out), size=min(n_edit, len(out)), replace=False)
    for i in idx:
        out[i] = vocab[rng.integers(0, len(vocab))]
    return out


def _char_flip(rng: np.random.Generator, text: str, n_flips: int) -> str:
    """Flip a few characters (D2 bit-flip)."""
    chars = list(text)
    for _ in range(n_flips):
        i = int(rng.integers(0, len(chars)))
        if chars[i] != " ":
            chars[i] = chr(((ord(chars[i]) - 97 + 1) % 26) + 97)
    return "".join(chars)


def generate_transcripts(
    n_base: int = 200,
    seed: int = 42,
    dup_frac: float = 0.30,
    min_turns: int = 4,
    max_turns: int = 14,
    min_tokens: int = 20,
    max_tokens: int = 120,
    hot_prefix_frac: float = 0.0,
) -> SynthResult:
    """Generate the F1 transcript table + F2 golden dup pairs.

    ``hot_prefix_frac`` > 0 plants the F5 skew fixture: that fraction of
    conversations open with one identical boilerplate turn, creating a hot
    LSH band bucket.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    hot_prefix = " ".join(vocab[:40].tolist())  # shared boilerplate (F5)

    # --- base conversations -------------------------------------------------
    convs: list[dict] = []  # {"turns": [(role, text, tool)], "cid": str}
    for b in range(n_base):
        n_turns = int(rng.integers(min_turns, max_turns + 1))
        turns = []
        for t in range(n_turns):
            role = ROLES[t % 3]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
            n_tok = int(rng.integers(min_tokens, max_tokens + 1))
            text = " ".join(_zipf_text(rng, vocab, n_tok))
            turns.append((role, text, tool))
        if hot_prefix_frac > 0 and rng.random() < hot_prefix_frac:
            turns[0] = ("user", hot_prefix, "")
        convs.append({"turns": turns})

    # --- plant duplicates ---------------------------------------------------
    n_dup = int(n_base * dup_frac)
    dup_classes = ["D0", "D1", "D2", "D3", "D4", "D4X"]
    pairs: list[tuple[str, str, str]] = []  # (conv_a, conv_b, dup_class) — a<b
    extra: list[dict] = []

    base_ids = [f"conv-{i:06d}" for i in range(n_base)]
    next_id = n_base

    def take_id() -> str:
        nonlocal next_id
        cid = f"conv-{next_id:06d}"
        next_id += 1
        return cid

    for d in range(n_dup):
        cls = dup_classes[d % len(dup_classes)]
        src = int(rng.integers(0, n_base))
        src_id = base_ids[src]
        turns = [tuple(t) for t in convs[src]["turns"]]
        cid = take_id()
        if cls == "D0":
            extra.append({"turns": turns, "cid": cid, "order": "normal"})
            pairs.append((src_id, cid, "D0"))
        elif cls == "D1":
            new_turns = []
            for role, text, tool in turns:
                toks = text.split(" ")
                toks = _edit_tokens(rng, toks, vocab, float(rng.uniform(0.01, 0.05)))
                new_turns.append((role, " ".join(toks), tool))
            extra.append({"turns": new_turns, "cid": cid, "order": "normal"})
            pairs.append((src_id, cid, "D1"))
        elif cls == "D2":
            new_turns = []
            for j, (role, text, tool) in enumerate(turns):
                if j < 3:
                    text = _char_flip(rng, text, 1)
                new_turns.append((role, text, tool))
            extra.append({"turns": new_turns, "cid": cid, "order": "normal"})
            pairs.append((src_id, cid, "D2"))
        elif cls == "D3":
            # two fresh conversations sharing one long verbatim span
            # (a fresh span per instance — D3 pairs are independent)
            shared_span = " ".join(_zipf_text(rng, vocab, 240))
            cid2 = take_id()
            for c in (cid, cid2):
                n_turns = int(rng.integers(min_turns, max_turns + 1))
                t2 = []
                for t in range(n_turns):
                    role = ROLES[t % 3]
                    tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
                    text = " ".join(_zipf_text(rng, vocab, int(rng.integers(min_tokens, max_tokens + 1))))
                    t2.append((role, text, tool))
                inj = int(rng.integers(0, len(t2)))
                role, text, tool = t2[inj]
                t2[inj] = (role, text + " " + shared_span, tool)
                extra.append({"turns": t2, "cid": c, "order": "normal"})
            pairs.append((min(cid, cid2), max(cid, cid2), "D3"))
        elif cls == "D4":
            extra.append({"turns": turns, "cid": cid, "order": "shuffled"})
            pairs.append((src_id, cid, "D4"))
        elif cls == "D4X":
            # permuted indices — texts attached to WRONG turn_idx → no match
            perm = rng.permutation(len(turns))
            new_turns = [turns[p] for p in perm]
            extra.append({"turns": new_turns, "cid": cid, "order": "normal"})
            # deliberately NOT recorded in pairs

    # --- materialize rows ---------------------------------------------------
    rows: list[tuple] = []
    all_convs = [{"turns": c["turns"], "cid": base_ids[i], "order": "normal"} for i, c in enumerate(convs)]
    all_convs += extra
    for ordinal, c in enumerate(all_convs):
        cid = c["cid"]
        n = len(c["turns"])
        order = list(range(n))
        if c.get("order") == "shuffled":
            order = rng.permutation(n).tolist()
        for t in order:
            role, text, tool = c["turns"][t]
            ts = BASE_TS + np.timedelta64(ordinal, "h") + np.timedelta64(30 * t, "s")
            rows.append((cid, t, role, text, tool, ts))

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"])
    pairs_df = pd.DataFrame(pairs, columns=["conv_a", "conv_b", "dup_class"])
    return SynthResult(
        transcripts=df,
        oracle_pairs=pairs_df,
        meta={"n_base": n_base, "seed": seed, "n_rows": len(df), "n_convs": len(all_convs)},
    )


def to_spark(spark, result: SynthResult):
    """Materialize the synthetic table as a Spark DataFrame with the exact
    input_hint schema (conv_id string, turn_idx int, role/text/tool string,
    ts timestamp)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(result.transcripts, schema=schema)
