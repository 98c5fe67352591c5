"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Planted duplicate families with known ground truth (FIXTURES.md F1):
  1. exact copies               -> exact-hash pass
  2. token-edit near-dups       -> MinHash/LSH pass
  3. count-skewed families      -> directional rule + count-ordered seeding
     (analog of UMI count chains, reference lib/sequence_error.py:53,83)
  4. long-verbatim-overlap      -> substring ("suffix-array") pass
  5. hot-band boilerplate       -> skew / salting exercise
  6. singletons                 -> negatives

All generation is seeded — same args, same corpus, byte for byte.
``truth`` maps url -> ground-truth cluster key (None for singletons).
"""

from __future__ import annotations

import datetime
import random
from dataclasses import dataclass, field

import pandas as pd

VOCAB = [
    "data", "table", "query", "spark", "shuffle", "join", "filter", "scan",
    "batch", "stream", "window", "group", "sort", "merge", "hash", "value",
    "count", "index", "column", "row", "page", "crawl", "web", "text",
    "engine", "cluster", "node", "edge", "graph", "label", "band", "bucket",
]

EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


@dataclass
class SynthCorpus:
    rows: list[dict] = field(default_factory=list)
    truth: dict[str, str | None] = field(default_factory=dict)

    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows)

    def to_spark(self, spark):
        pdf = self.to_pandas()
        return spark.createDataFrame(
            pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
        )

    def truth_pairs(self) -> set[tuple[str, str]]:
        """Ground-truth same-cluster url pairs (canonical src<dst)."""
        by_key: dict[str, list[str]] = {}
        for url, key in self.truth.items():
            if key is not None:
                by_key.setdefault(key, []).append(url)
        pairs = set()
        for urls in by_key.values():
            urls = sorted(urls)
            for i in range(len(urls)):
                for j in range(i + 1, len(urls)):
                    pairs.add((urls[i], urls[j]))
        return pairs


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _doc(rng: random.Random, n_tokens: int) -> str:
    return _sentence(rng, n_tokens)


def _perturb_tokens(rng: random.Random, text: str, n_edits: int) -> str:
    """Edit n_edits token positions, guaranteeing each edit changes the
    token (so variants are genuinely distinct texts — the planted truth
    depends on exact-family multiplicities like 9/5/3 staying separate)."""
    toks = text.split()
    for _ in range(n_edits):
        i = rng.randrange(len(toks))
        choices = [w for w in VOCAB if w != toks[i]]
        toks[i] = rng.choice(choices)
    return " ".join(toks)


def make_pages(
    n_docs: int = 200,
    seed: int = 42,
    doc_tokens: int = 120,
    hot_band_size: int = 0,
) -> SynthCorpus:
    """Build a corpus of ~n_docs pages with planted duplicate families."""
    rng = random.Random(seed)
    corpus = SynthCorpus()
    i = 0

    def add(text: str, key: str | None, lang: str = "en"):
        nonlocal i
        url = f"https://site{i % 17}.example/p/{i}"
        ts = EPOCH + datetime.timedelta(seconds=i * 37)
        html = f"<html><body>{text}</body></html>".encode()
        corpus.rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}
        )
        corpus.truth[url] = key
        i += 1

    n_exact = max(2, n_docs // 10)
    n_near = max(2, n_docs // 10)
    n_skew = max(0, n_docs // 20)
    n_sub = max(2, n_docs // 20)

    # 1. exact-copy families (pairs/triples, identical text distinct url)
    f = 0
    while f < n_exact:
        base = _doc(rng, doc_tokens)
        fam = rng.choice((2, 3))
        for _ in range(fam):
            add(base, f"exact{f}")
        f += 1

    # 2. token-edit near-dup families (k edits << shingle count)
    f = 0
    while f < n_near:
        base = _doc(rng, doc_tokens)
        add(base, f"near{f}")
        for _ in range(rng.choice((1, 2))):
            add(_perturb_tokens(rng, base, rng.randint(1, 3)), f"near{f}")
        f += 1

    # 3. count-skewed family: exact-copy multiplicities 9/5/3 on a
    #    hamming-chain of variants (directional rule: 9>=2*5-1, 5>=2*3-1)
    for f in range(n_skew):
        base = _doc(rng, doc_tokens)
        v1 = _perturb_tokens(rng, base, 1)
        v2 = _perturb_tokens(rng, v1, 1)
        for text, mult in ((base, 9), (v1, 5), (v2, 3)):
            for _ in range(mult):
                add(text, f"skew{f}")

    # 4. long-verbatim-overlap: distinct docs sharing a long substring
    for f in range(n_sub):
        shared = _doc(rng, 80)  # ~400+ chars shared verbatim
        for _ in range(2):
            add(f"{_doc(rng, 40)} {shared} {_doc(rng, 40)}", f"sub{f}")

    # 5. hot band: many docs sharing boilerplate + tiny unique tail
    for j in range(hot_band_size):
        boiler = "page not found error the requested resource is gone " * 5
        add(f"{boiler} ref {j} {_sentence(rng, 3)}", "hot0")

    # 6. singletons
    while i < n_docs:
        add(_doc(rng, doc_tokens), None, lang=rng.choice(("en", "fr", "es", "de", "zh")))

    return corpus


def spark_synth_pages(spark, n_docs: int, seed: int = 42, doc_tokens: int = 120):
    """Distributed deterministic corpus generator — text synthesized
    entirely JVM-side (range -> sequence/transform/xxhash64), so bench
    corpora of millions of docs never bottleneck on the driver.

    Planted structure (deterministic in i):
      * i % 10 in {0,1}  -> exact-dup pair (both share base floor(i/10)*10)
      * i % 10 in {2,3,4}-> near-dup triple of base i-(i%10)+2 with one
                            token edited per variant
      * else             -> singleton
    """
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in VOCAB for _ in (0,)])
    nv = len(VOCAB)
    df = spark.range(n_docs).select(F.col("id").alias("i"))
    m = F.col("i") % 10
    base = (
        F.when(m < 2, (F.col("i") / 10).cast("long") * 10)
        .when(m < 5, F.col("i") - m + 2)
        .otherwise(F.col("i"))
    )
    edit_pos = F.when((m >= 2) & (m < 5), F.pmod(F.col("i"), F.lit(doc_tokens)) + 1).otherwise(F.lit(-1))
    is_variant = (m >= 3) & (m < 5)  # m==2 is the family base text

    def tok(j):
        normal = F.element_at(vocab, (F.pmod(F.xxhash64(base, j, F.lit(seed)), F.lit(nv)) + 1).cast("int"))
        edited = F.element_at(vocab, (F.pmod(F.xxhash64(F.col("i"), j, F.lit(seed + 1)), F.lit(nv)) + 1).cast("int"))
        return F.when(is_variant & (j == edit_pos), edited).otherwise(normal)

    text = F.array_join(F.transform(F.sequence(F.lit(1), F.lit(doc_tokens)), tok), " ")
    return df.select(
        F.concat(F.lit("https://bench.example/p/"), F.col("i")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("i")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )


def documents_to_pages(df):
    """Adapter: driver testdata ``documents`` table -> pages shape.

    documents(doc_id,text,lang,source,n_chars) -> url/warc_ts/html/text/lang,
    keeping doc_id. url <- "doc://{source}/{doc_id}" (unique, deterministic).
    """
    from pyspark.sql import functions as F

    return df.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 37).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "UTF-8").alias("html"),
        "text",
        "lang",
        "doc_id",
    )


def make_boundary_pairs(
    seed: int = 7,
    jaccard_block_lens: tuple[int, ...] = (11, 12, 13, 14, 15, 16),
    n_per_len: int = 40,
    n_blocks: int = 10,
    hamming_edits: tuple[int, ...] = (1, 2, 3, 4, 5, 6),
    n_per_edit: int = 30,
):
    """Near-threshold recall fixture (VERDICT r4 #2): planted pairs that
    sit AT the candidate-generation boundary, where LSH recall can
    genuinely fall below 1.0.

    Two pair populations, each pair in its own group with a group-unique
    vocabulary (zero accidental cross-pair similarity):

    * Jaccard-boundary pairs: both docs are ``n_blocks`` SHARED blocks of
      ``L`` tokens separated by per-doc unique single tokens. Shared
      shingles come only from block interiors (L-4 per block), so the
      exact shingle-set Jaccard ~ (L-4)/(L+6) — L in 11..16 spans
      J ~ 0.43..0.56, bracketing the 0.5 verification gate. Blocks are
      shorter than the substring pass's 24-token window, so the substring
      channel CANNOT rescue a missed LSH candidate — this isolates the
      MinHash band s-curve.
    * Hamming-boundary pairs: a base doc with ``e`` token replacements;
      the realized SimHash distance is measured by the caller and binned
      around the hamming_threshold (t-1 / t / t+1).

    Returns ``(docs, pairs)`` pandas DataFrames: docs in the driver
    ``documents`` shape (doc_id, text, lang, source, n_chars; source =
    the pair's group, so ``lsh_recall_report``'s same-source blocking
    applies), pairs = (a_id, b_id, kind, param).
    """
    rng = random.Random(seed)
    docs: list[dict] = []
    pairs: list[dict] = []
    next_id = 0

    def add_doc(text: str, source: str) -> int:
        nonlocal next_id
        did = next_id
        next_id += 1
        docs.append(
            {
                "doc_id": did,
                "text": text,
                "lang": "en",
                "source": source,
                "n_chars": len(text),
            }
        )
        return did

    grp = 0
    for L in jaccard_block_lens:
        for _ in range(n_per_len):
            g = f"jb{grp}"
            grp += 1
            mk = lambda i: f"g{grp}x{i}"
            n_shared = n_blocks * L
            shared = [mk(i) for i in range(n_shared)]
            blocks = [shared[b * L : (b + 1) * L] for b in range(n_blocks)]
            ua = [mk(n_shared + i) for i in range(n_blocks + 1)]
            ub = [mk(n_shared + n_blocks + 1 + i) for i in range(n_blocks + 1)]

            def weave(uniq):
                toks: list[str] = [uniq[0]]
                for b, blk in enumerate(blocks):
                    toks.extend(blk)
                    toks.append(uniq[b + 1])
                return " ".join(toks)

            a = add_doc(weave(ua), g)
            b = add_doc(weave(ub), g)
            pairs.append({"a_id": a, "b_id": b, "kind": "jaccard", "param": L})

    for e in hamming_edits:
        for _ in range(n_per_edit):
            g = f"hb{grp}"
            grp += 1
            base = [f"g{grp}h{i}" for i in range(120)]
            var = list(base)
            for pos in rng.sample(range(120), e):
                var[pos] = f"g{grp}e{pos}"
            a = add_doc(" ".join(base), g)
            b = add_doc(" ".join(var), g)
            pairs.append({"a_id": a, "b_id": b, "kind": "hamming", "param": e})

    return pd.DataFrame(docs), pd.DataFrame(pairs)
