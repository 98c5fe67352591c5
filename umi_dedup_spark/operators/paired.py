"""Paired combined-fingerprint extraction — graft of the reference's
paired-end UMI flow (``extract_umi_paired.py:30-46`` +
``lib/parse_fastq.py:112-144`` ``get_read_pair_umis``):

* two record streams are co-scanned 1:1 by a shared key (the reference
  zips two FASTQ files and hard-errors on mismatched read names);
* each mate contributes a fixed-width key extracted from its payload
  prefix (UMI analog: the leading ``n_tokens`` of the normalized text,
  with optional masked positions);
* the combined key is ``key1 + separator + key2`` — and when either side
  extracts an empty key (length 0), the separator is dropped and the
  combined key is just the other side's key, exactly as the reference
  drops ``pair_separator`` when ``umi_length1 == 0 or umi_length2 == 0``;
* BOTH mates carry the same combined key afterwards.

All key extraction is JVM-side expressions; the co-scan is an equi-join
on the shared key (shuffle or broadcast, Catalyst's choice) and the
mismatch check is a cheap limit-1 probe (the analog of the reference's
per-record RuntimeError).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEPARATOR = "+"


class PairMismatchError(RuntimeError):
    """A record key present on one side of the pair only — the analog of
    the reference's 'mismatched reads' RuntimeError
    (``lib/parse_fastq.py:134``)."""


def extract_prefix_key(
    text: Column, n_tokens: int, before: int = 0, mask: tuple[int, ...] = ()
) -> Column:
    """UMI-analog key: tokens [before+1 .. before+n_tokens] of the
    whitespace-tokenized payload, with 1-based ``mask`` positions (within
    the key) replaced by '_' (the reference's mask_pos skip,
    ``lib/parse_fastq.py:60-66``). n_tokens=0 yields ''."""
    if n_tokens == 0:
        return F.lit("")
    toks = F.slice(F.split(F.trim(text), r"\s+"), before + 1, n_tokens)
    if mask:
        toks = F.transform(
            toks,
            lambda t, i: F.when(
                i.isin([m - 1 for m in mask]), F.lit("_")
            ).otherwise(t),
        )
    return F.concat_ws(" ", toks)


def paired_combined_keys(
    mate1: DataFrame,
    mate2: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    n_tokens1: int = 2,
    n_tokens2: int = 2,
    before1: int = 0,
    before2: int = 0,
    mask1: tuple[int, ...] = (),
    mask2: tuple[int, ...] = (),
    separator: str = DEFAULT_SEPARATOR,
    strict: bool = True,
) -> DataFrame:
    """Co-scan two tables by ``key_col`` and attach the combined pair key.

    Returns one row per pair: (key_col, key1, key2, pair_key). With
    ``strict`` (the reference's behavior) a key present on only one side
    raises :class:`PairMismatchError`; otherwise unmatched rows are
    dropped (inner join).
    """
    if n_tokens1 == 0 or n_tokens2 == 0:
        separator = ""  # reference: lib/parse_fastq.py:133
    k1 = mate1.select(
        F.col(key_col),
        extract_prefix_key(F.col(text_col), n_tokens1, before1, mask1).alias("key1"),
    )
    k2 = mate2.select(
        F.col(key_col),
        extract_prefix_key(F.col(text_col), n_tokens2, before2, mask2).alias("key2"),
    )
    how = "full" if strict else "inner"
    joined = k1.join(k2, key_col, how)
    if strict:
        bad = joined.filter(
            F.col("key1").isNull() | F.col("key2").isNull()
        ).limit(1)
        rows = bad.collect()
        if rows:
            raise PairMismatchError(
                f"mismatched pair records: {key_col}={rows[0][key_col]!r} "
                "present on one side only"
            )
    combined = F.concat(F.col("key1"), F.lit(separator), F.col("key2"))
    return joined.select(
        key_col, "key1", "key2", combined.alias("pair_key")
    )


def paired_key_counts(pairs: DataFrame) -> DataFrame:
    """Combined-key frequency table (the reference's UMI-table output for
    paired mode, ``lib/umi_data.py:105-119`` over combined keys)."""
    return pairs.groupBy("pair_key").agg(F.count(F.lit(1)).alias("n_pairs"))
