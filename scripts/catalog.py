#!/usr/bin/env python3
"""Generate the README gate catalog from the SparkEntry gate registry.

Parses src/main/scala/graft/SparkEntry.scala for `"name" -> Gated(`
entries, captures each gate's preceding comment block (the operator's
in-registry documentation) and the first graft operator call in its
body, and rewrites the README section between the
`<!-- gate-catalog:begin -->` / `<!-- gate-catalog:end -->` markers.

Run from the repo root: python3 scripts/catalog.py
"""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"
README = "README.md"
BEGIN = "<!-- gate-catalog:begin -->"
END = "<!-- gate-catalog:end -->"

OPS = (
    "Planner|TsAnalytics|EventOps|Dedup|Embed|Text|Sample|Bpe|Multimodal|"
    "CorpusIo|StreamIngest|Rollup|RunLog|Ingest|Meta|Api|GateNorm|TsStore|"
    "OutputFormat|LineProtocol|WireIngest|VecMath|Sax|Anomaly"
)

GROUPS = [
    ("q", "Relational join-plan gates (TPC-H-ish)"),
    ("ts_apply", "Reference post-processing nodes (`apply` pipeline)"),
    ("ts_", "Time-series query kinds + analytics"),
    ("ingest_", "Ingestion surfaces"),
    ("layout_", "Storage layout"),
    ("search_", "Series search"),
    ("suggest_", "Suggest endpoints"),
    ("output_", "Output formats"),
    ("meta_", "Metadata"),
    ("sql_", "SQL extension surface"),
    ("doc_", "Document curation / dedup / text analysis"),
    ("embed_", "Embedding similarity / clustering"),
    ("ann_", "Approximate nearest neighbour retrieval"),
    ("bpe_", "Tokenizer"),
    ("mm_", "Multimodal"),
]


def group_of(name: str) -> str:
    for prefix, title in GROUPS:
        if name.startswith(prefix):
            return title
    return "Other"


def first_sentence(text: str, limit: int = 220) -> str:
    text = re.sub(r"-{3,}", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    # cut at the first sentence end that isn't an abbreviation-ish dot
    m = re.search(r"(?<=[a-z0-9)\]`])\.\s", text)
    if m and m.end() < limit + 40:
        text = text[: m.start() + 1]
    if len(text) > limit:
        text = text[: limit - 1].rstrip() + "…"
    return text.replace("|", "\\|")


def parse_gates(path: str):
    src = open(path).read().splitlines()
    gates = []
    for i, line in enumerate(src):
        m = re.match(r'\s*"([a-z0-9_]+)" -> Gated\(', line)
        if not m:
            continue
        name = m.group(1)
        j = i - 1
        comment = []
        while j >= 0 and src[j].strip().startswith("//"):
            comment.append(src[j].strip().lstrip("/").strip())
            j -= 1
        comment.reverse()
        text = " ".join(c.lstrip("-").strip() for c in comment)
        impl = ""
        saw_df = False
        for k in range(i, min(i + 30, len(src))):
            # the oracle SQL (and whatever follows the entry) is out of
            # scope for the implementation column
            if k > i and re.match(r"\s*(Some\(|None\)|Some\(s?\"\"\")", src[k]):
                break
            mm = re.search(r"\b((?:%s)\.\w+)" % OPS, src[k])
            if mm:
                impl = mm.group(1)
                break
            if re.search(r"\brunFrame\b|\brunEv\b|\brunDim\b|\brun\(", src[k]):
                impl = "Planner.plan"
                break
            if re.search(r"\bs\.sql\(|\bspark\.sql\(", src[k]):
                impl = "spark.sql"
                break
            if "TestData.table" in src[k] or "TestData.events" in src[k]:
                saw_df = True
        if not impl and saw_df:
            impl = "DataFrame ops"
        gates.append((name, text, impl))
    return gates


def render(gates) -> str:
    n_oracle = len(gates)
    by_group = {}
    for name, text, impl in gates:
        by_group.setdefault(group_of(name), []).append((name, text, impl))
    lines = [
        BEGIN,
        "",
        "## Gate catalog (generated)",
        "",
        f"All **{n_oracle} driver gates**, generated from the `Gated` registry in",
        "`src/main/scala/graft/SparkEntry.scala` by `scripts/catalog.py` — every",
        "row has a DataFrame implementation AND a DuckDB oracle twin compared",
        "rows+schema+hash by the driver. The note column is the gate's own",
        "in-registry comment (first sentence).",
        "",
        "Scale valves to know about (full guidance in the operators' scaladoc):",
        "`Dedup.minhashLsh(maxBucket)` drops over-cap LSH buckets before the",
        "quadratic candidate self-join (use `minhashLshStar` — Θ(d) hub edges —",
        "when the product is clusters, the clique only when the pair list itself",
        "is the ask); `minhashLshStar(hubSalt)`/`nearDupLshStar(hubSalt)` bound",
        "window partitions for degenerate mega-buckets; `ngramJaccard(maxBucket)`",
        "and `sharedSpanPairs(maxBucket)` cap boilerplate shingle buckets;",
        "`Embed.semDedupPairs(maxCell)` excludes pathological IVF cells;",
        "`Dedup.lshTuningReport(maxDocs)` bounds the diagnostic to a",
        "deterministic sample; `Multimodal` near-dup uses a max-bucket",
        "black-frame valve. `Dedup.minhashLshStarRejected` is the star form's",
        "under-merge signal (hub edges that failed exact verification);",
        "`Dedup.lshOverCapBuckets` names every bucket a `maxBucket` cap dropped",
        "(empty output proves the cap changed nothing). `maxDocChars` on the",
        "signature ops (`minhashLsh`/`minhashLshStar`/`simhashNearDup`) is the",
        "giant-document valve: fingerprints cover at most the first N characters",
        "(prefix fingerprinting), so one 100 MB document can't become a",
        "25M-element hash array in a single row — default off.",
        "",
        "Posture for corpora with unreliable size statistics: when a frame's",
        "estimated size is far below its real volume (explode-constructed",
        "replicas, selective-looking UDF filters, fresh tables without ANALYZE),",
        "Catalyst's ESTIMATE-driven static broadcasts will happily plan a",
        "multi-GB driver collect. Disable them and let AQE promote joins from",
        "measured runtime shuffle sizes instead — set",
        "`spark.sql.autoBroadcastJoinThreshold=-1` and keep",
        "`spark.sql.adaptive.autoBroadcastJoinThreshold` at its normal value",
        "(`ScaleCheck.scala` does exactly this above factor 100, where the",
        "estimate error reaches 1000x; a 1 GiB+ driver collect killed the star",
        "dedup before the switch). Multi-stage pipeline compositions should also",
        "materialize stage boundaries (`localCheckpoint` or intermediate parquet)",
        "— an un-cut lineage re-executes the whole prefix per downstream",
        "reference and multiplies the logical-plan tree per stage, which blows",
        "the DRIVER heap on planning alone before a single task runs.",
        "",
    ]
    ordered_titles = [t for _, t in GROUPS] + ["Other"]
    seen = set()
    for title in ordered_titles:
        if title in seen or title not in by_group:
            continue
        seen.add(title)
        rows = by_group[title]
        lines.append(f"### {title} ({len(rows)})")
        lines.append("")
        lines.append("| gate | operator | note |")
        lines.append("|---|---|---|")
        for name, text, impl in rows:
            impl_md = f"`{impl}`" if impl else ""
            lines.append(f"| `{name}` | {impl_md} | {first_sentence(text)} |")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main():
    gates = parse_gates(SRC)
    if len(gates) < 100:
        sys.exit(f"parse failure: only {len(gates)} gates found")
    section = render(gates)
    readme = open(README).read()
    if BEGIN in readme and END in readme:
        pre = readme[: readme.index(BEGIN)]
        post = readme[readme.index(END) + len(END):]
        out = pre + section + post
    else:
        out = readme.rstrip() + "\n\n" + section + "\n"
    open(README, "w").write(out)
    print(f"catalog: {len(gates)} gates written to {README}")


if __name__ == "__main__":
    main()
