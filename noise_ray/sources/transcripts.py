"""Deterministic synthetic transcript generator.

Produces the input table shape required by the engine (BASELINE.json
``input_hint``): ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.  Fully seeded — no external data.  Text
vocabulary is Zipfian so a handful of stems dominate (hot-term skew,
FIXTURES.md §1.7), and the fixture strata from FIXTURES.md §1 are injected
into the small scales so conformance tests can rely on them.

Every conversation is generated from its own ``np.random.default_rng([seed,
conv_index])`` stream, so the table content is a pure function of
(num_convs, seed, max_turns) — independent of ``num_files`` and of whether
generation runs inline or as parallel Ray tasks (one task per output file
for large corpora).

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
_VOCAB = np.array((
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
).split())

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

_BASE_TS = 1_700_000_000_000_000  # us


def _gen_conv_range(seed: int, c_lo: int, c_hi: int, max_turns: int,
                    include_fixtures: bool) -> pa.Table:
    """Generate conversations [c_lo, c_hi) — content depends only on
    (seed, conv index, max_turns), never on the range split."""
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    vocab, nv = _VOCAB, len(_VOCAB)
    for c in range(c_lo, c_hi):
        rng = np.random.default_rng([seed, c])
        conv = f"conv-{c:08d}"
        n_turns = int(rng.integers(2, max_turns + 1))
        role_ix = rng.integers(0, len(ROLES), size=n_turns)
        tool_ix = rng.integers(0, len(TOOLS), size=n_turns)
        n_words = rng.integers(3, 60, size=n_turns)
        ranks = np.minimum(rng.zipf(1.3, size=int(n_words.sum())) - 1, nv - 1)
        fixture_here = include_fixtures and c < len(FIXTURE_TEXTS)
        t0 = _BASE_TS + c * 3_600_000_000
        w = 0
        for t in range(n_turns):
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(str(ROLES[int(role_ix[t])]))
            k = int(n_words[t])
            if fixture_here and t == 0:
                texts.append(FIXTURE_TEXTS[c])
            else:
                texts.append(" ".join(vocab[ranks[w:w + k]]))
            w += k
            tools.append(str(TOOLS[int(tool_ix[t])]))
            tss.append(t0 + t * 30_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _write_file(out_dir: str, f: int, seed: int, c_lo: int, c_hi: int,
                max_turns: int, include_fixtures: bool) -> str:
    path = os.path.join(out_dir, f"part-{f:05d}.parquet")
    t = _gen_conv_range(seed, c_lo, c_hi, max_turns, include_fixtures)
    tmp = f"{path}.tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def generate_transcripts(
    out_dir: str,
    num_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 20,
    num_files: int = 8,
    include_fixtures: bool = True,
) -> list[str]:
    """Write transcript parquet files to ``out_dir``; return file paths.

    Deterministic for a given (num_convs, seed, max_turns) — ``num_files``
    only changes the partitioning, never the content.  Large corpora are
    generated by parallel Ray tasks (one per file) when Ray is up.
    """
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, num_convs, num_files + 1).astype(int)
    jobs = [(f, int(bounds[f]), int(bounds[f + 1]))
            for f in range(num_files) if bounds[f + 1] > bounds[f]]

    use_ray = num_convs >= 4096
    if use_ray:
        import ray

        if not ray.is_initialized():
            use_ray = False
    if use_ray:
        import ray

        gen = ray.remote(_write_file)
        paths = ray.get([
            gen.remote(out_dir, f, seed, lo, hi, max_turns, include_fixtures)
            for f, lo, hi in jobs
        ])
    else:
        paths = [_write_file(out_dir, f, seed, lo, hi, max_turns,
                             include_fixtures)
                 for f, lo, hi in jobs]
    return sorted(paths)
