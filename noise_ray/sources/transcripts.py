"""Deterministic synthetic transcript generator.

Produces the input table shape required by the engine (BASELINE.json
``input_hint``): ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.  Fully seeded — no external data.  Text
vocabulary is Zipfian so a handful of stems dominate (hot-term skew,
FIXTURES.md §1.7), and the fixture strata from FIXTURES.md §1 are injected
into the small scales so conformance tests can rely on them.

Files are written sorted by (conv_id, turn_idx) and partitioned into
non-overlapping conv_id ranges, which is what the index build's
metadata-only doc_id assignment fast path expects (see
noise_ray/build/docids.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "browser", "python", "editor"])

# Base vocabulary: common English-ish words; Zipf ranks applied on top.
_VOCAB = (
    "the of and a to in is you that it he was for on are as with his they I "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up other "
    "about out many then them these so some her would make like him into time "
    "has look two more write go see number no way could people my than first "
    "water been call who oil its now find long down day did get come made may "
    "part over new sound take only little work know place year live me back "
    "give most very after thing our just name good sentence man think say "
    "great where help through much before line right too mean old any same "
    "tell boy follow came want show also around form three small set put end "
    "does another well large must big even such because turn here why ask "
    "went men read need land different home us move try kind hand picture "
    "again change off play spell air away animal house point page letter "
    "mother answer found study still learn should america world quick brown "
    "fox jumps lazy dog server error timeout retry request response token "
    "model agent pipeline index search query shard partition cluster stream "
    "batch vector embedding transcript deploy commit merge branch compile "
    "runtime memory buffer socket thread process schedule latency throughput"
).split()

# FIXTURES.md §1 strata — injected verbatim as the first turns of the first
# conversations at every scale (hand-checkable, locks golden scores).
FIXTURE_TEXTS = [
    "fox",
    "quick fox",
    "quick brown fox",
    "Multi word sentence",
    "a bunch of words in this sentence",
    "THEse Words deeplY test smOOthly that stemmING",
    "Didgeridoos™",
    "Ünicöde stemming",
    "  @#$!== \t+-",
    "",
    "@!?   Let's seeing...",
    "repeat repeat repeat stress test repeat",
]


def _zipf_text(rng: np.random.Generator, n_words: int) -> str:
    # Zipf-ish: P(rank k) ∝ 1/(k+3); heavy head over ~400-word vocab.
    ranks = rng.zipf(1.3, size=n_words)
    ranks = np.minimum(ranks - 1, len(_VOCAB) - 1)
    return " ".join(_VOCAB[r] for r in ranks)


def generate_transcripts(
    out_dir: str,
    num_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 20,
    num_files: int = 8,
    include_fixtures: bool = True,
) -> list[str]:
    """Write transcript parquet files to ``out_dir``; return file paths.

    Deterministic for a given (num_convs, seed, max_turns, num_files).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_ts = 1_700_000_000_000_000  # us
    for c in range(num_convs):
        conv = f"conv-{c:08d}"
        n_turns = int(rng.integers(2, max_turns + 1))
        fixture_here = include_fixtures and c < len(FIXTURE_TEXTS)
        t0 = base_ts + c * 3_600_000_000
        for t in range(n_turns):
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(str(ROLES[int(rng.integers(0, len(ROLES)))]))
            if fixture_here and t == 0:
                texts.append(FIXTURE_TEXTS[c])
            else:
                texts.append(_zipf_text(rng, int(rng.integers(3, 60))))
            tool = str(TOOLS[int(rng.integers(0, len(TOOLS)))])
            tools.append(tool)
            tss.append(t0 + t * 30_000_000)

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )

    # Partition into non-overlapping conv_id ranges, sorted within each file.
    n = table.num_rows
    paths = []
    # split on conversation boundaries so files don't share a conv
    conv_arr = np.asarray(table["conv_id"])
    boundaries = np.linspace(0, num_convs, num_files + 1).astype(int)
    conv_first_row = {}
    for i, cv in enumerate(conv_arr):
        if cv not in conv_first_row:
            conv_first_row[cv] = i
    conv_names = sorted(conv_first_row)
    row_bounds = [0]
    for b in boundaries[1:-1]:
        if b < len(conv_names):
            row_bounds.append(conv_first_row[conv_names[b]])
    row_bounds.append(n)
    for f in range(len(row_bounds) - 1):
        lo, hi = row_bounds[f], row_bounds[f + 1]
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path)
        paths.append(path)
    return paths
