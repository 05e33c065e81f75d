"""Job configuration — the Spark analogue of the reference's env-driven
settings (/root/reference/utils/settings.py:10-14).

Only the knobs that affect extraction semantics live here; cluster tuning
(shuffle partitions, AQE, Arrow batch size) is applied by
``plans.pipeline.configure_spark``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractConfig:
    # SharedSettings.confidence_threshold (settings.py:13) — required in the
    # reference; we default to the value used throughout its docs/tests era.
    confidence_threshold: float = 0.7
    # SharedSettings.use_aggressive_strategy (settings.py:14), default False.
    use_aggressive_strategy: bool = False
    # Spans above this count mark a document as skewed ("mega-doc"): it is
    # split page-wise before the kernel and reassembled after (SURVEY §4.2).
    mega_doc_span_cutoff: int = 20_000
    # Pages per split task for mega docs. One page per task maximizes
    # balance but pays the kernel's per-invocation overhead page by page;
    # grouping a run of pages amortizes it. Round-4 measured
    # ~6ms/invocation with the numpy reading-order kernel and set 8;
    # round 6's native kernel cut the per-invocation cost ~25×, flipping
    # the balance/overhead tradeoff — re-swept on the --mega corpus at
    # 32 cores: 8/4/2/1 pages → 11.6/7.9/5.5/5.2s. 2 sits within ~5% of
    # the optimum while keeping per-chunk scheduling overhead halved for
    # narrow clusters; the split/reassemble output is bit-identical at
    # any chunking (test_mega_doc_split_is_exact).
    mega_doc_pages_per_task: int = 2
    # Guard replacing the reference's 10MB page-payload limit
    # (applyocr.py:34-49): pages with more candidate lines than this are
    # skipped (emit base layer only), keeping a 10^12-doc job alive. The
    # reading-order kernel is O(n²)-O(n³) per page (like the reference), so
    # this also bounds worst-case task time; real pages top out well below
    # this (a dense A0 scan is ~2-3k lines).
    max_lines_per_page: int = 5_000
    # Oversized-page guard: the visibility mask (C3/C6) is a page-area
    # byte array, so a corrupt giant coordinate would allocate page_w*page_h
    # bytes and kill the task. Pages whose area exceeds this cap (10^8 pt²
    # ≈ a 10k×10k-pt page — far beyond PDF's 14400-pt legal maximum on any
    # sane aspect ratio) are passed through untouched instead of analyzed,
    # like the reference's oversized-payload skip (applyocr.py:63-65).
    max_page_mask_area: float = 100_000_000.0
    # When the input carries word-level spans (the raw detection granularity
    # — Textract WORD blocks in the reference), group them into text lines
    # first via the E1 band/word-join rules (assemble.lines_from_words);
    # line confidence = mean of word confidences.
    build_lines_from_words: bool = False


@dataclass(frozen=True)
class DedupConfig:
    """Scale knobs for the near-dup family.

    The SimHash banded Hamming join is pigeonhole-complete for distance
    d ≤ bands − 1; fingerprint width = bands × band_bits. Two levers:

    * ``simhash_bands``     — more bands = larger complete distance AND a
      cheaper per-band key, but more candidate rows per doc
    * ``simhash_band_bits`` — the bucket-count lever: 2^band_bits values
      per band. THIS is what must grow with corpus size — at 10^12 docs an
      8-bit band has only 256 buckets, so each bucket goes quadratic.

    Widths ≤ 62 bits run as one non-negative BIGINT fingerprint; wider
    settings (up to 128 bits — one md5 digest's worth of vote bits) run as
    TWO BIGINT halves with band keys derived before packing
    (functions/textops.simhash_wide_band_values / pack_band_half), so
    nothing caps the bucket count at the single-BIGINT sign bit anymore.

    Default: the corpus-scale setting — 8 bands × 16 bits = 128-bit
    fingerprints, complete for d ≤ 7 AND 65,536 buckets per band (the
    round-3 default was 8×7 = 56-bit: d ≤ 7 but only 128 buckets/band,
    which goes quadratic within buckets at 10^12 docs)."""

    simhash_bands: int = 8
    simhash_band_bits: int = 16
    # Hot-bucket actuator (round-5): the banded families collapse exact
    # duplicates to one representative BEFORE banding (a k-wide
    # byte-identical cluster — ubiquitous web boilerplate — costs O(1)
    # banded rows instead of O(k), so its candidate pairs are O(1) instead
    # of O(k²)), and any band bucket whose REPRESENTATIVE population still
    # exceeds this cap is routed out of the pair join (same shape as the
    # Jaccard hot-shingle cap). A pair is lost only if EVERY band it shares
    # is over-cap — with 8 independent bands that is precisely the
    # pathological near-identical mega-cluster whose k² candidates would
    # kill the stage; `dedup_band_stats.n_over_cap` counts the routed
    # buckets so the drop is never silent.
    band_bucket_cap: int = 200

    @property
    def simhash_bits(self) -> int:
        return self.simhash_bands * self.simhash_band_bits
