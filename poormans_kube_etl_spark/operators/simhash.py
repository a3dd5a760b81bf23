"""SimHash (64-bit) near-duplicate fingerprints — pure DataFrame ops.

Classic Charikar construction: hash each token to 64 bits (xxhash64,
or two md5 halves when a second engine must recompute the result —
see ``simhash_bits_df``); for each bit position accumulate +1/-1
across tokens; the sign vector is the fingerprint. Near-dups are pairs
within a small Hamming distance.

Shape: tokens are EXPLODED to rows and the 64 per-bit sums are a single
hash-aggregate (64 ``sum`` columns) — each token is hashed once inside
whole-stage codegen (subexpression elimination shares the xxhash64
across the 64 getbits), map-side partial aggregation makes the shuffle
carry 64 ints per doc. The earlier array-expression formulation
(aggregate of zip_with over nested transforms) allocated a 64-element
array per token per doc outside codegen — ~10× slower and it degrades
with document length; rows scale out, array expressions don't.

The fingerprint is materialized as an array<int> of 64 bits rather than
one packed long: PySpark's shiftleft/shiftright wrappers only take
literal shift counts, and packing bit 63 would overflow a long under
ANSI mode. Blocks for the pigeonhole candidate step are packed 16 bits
at a time (acc*2+bit, max 65535 — safe), which is all the pairing needs.

Deterministic across runs under either hash family (fixed xxhash64 /
md5 — no seeds, no RNG), and with ``token_hash="md5"`` independently
recomputable by DuckDB for full value-hash oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from poormans_kube_etl_spark.operators.text import normalize_text, tokens

_BITS = 64
_BLOCK_BITS = 16
_N_BLOCKS = _BITS // _BLOCK_BITS


def simhash_bits_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """DataFrame[id, bits: array<int>] — one 64-bit sign vector per doc.

    explode(tokens) → groupBy(id) with 64 partial-aggregated bit sums;
    ties (sum == 0, incl. empty docs) resolve to bit 0.

    ``token_hash`` picks the per-token 64-bit source:

    - ``"xxhash64"`` (default): Spark's native seed-0 xxhash64 — the
      fastest JVM path, but no second engine implements it, so results
      are only rerun-checkable.
    - ``"md5"``: two 60-bit halves of the md5 hex digest
      (``conv(substring(md5(tok), 1|16, 15), 16, 10)``), bit b drawn
      from half b//60. md5 exists verbatim in DuckDB, which makes the
      WHOLE simhash pipeline independently recomputable by a second
      engine — the same cross-engine discipline as
      ``text.token_hash`` (rolling fingerprints). ~Same plan shape:
      one digest per token materialized in its own projection, 64
      getbit sums; md5 costs ~2-3× xxhash64 per token, which the
      signature stage absorbs (bit-sum aggregation dominates).
    """
    from poormans_kube_etl_spark.operators.exprcache import cached_expr
    from poormans_kube_etl_spark.sources import spread_small_scan

    toks = tokens(normalize_text(F.col(text_col)))
    # hash in its own projection: 64 aggregate update expressions each
    # reference h — materializing it guarantees one string hash per
    # token instead of relying on CSE inside the aggregate
    docs = spread_small_scan(docs, heavy=True)  # token explode + 64 bit-sums per row
    ex = docs.select(id_col, F.explode(toks).alias("tok"))
    if token_hash == "xxhash64":
        ex = ex.select(id_col, F.xxhash64("tok").alias("h"))

        def _bit(b: int) -> str:
            return f"getbit(h, {b})"

    elif token_hash == "md5":
        # 15 hex chars = 60 bits < 2^63: conv's unsigned decimal string
        # casts to bigint without ANSI overflow; a full-16-char slice
        # would not (values >= 2^63). Bits 60-63 come from the second
        # independent half, so all 64 bit decisions stay hash-driven.
        # The digest gets ITS OWN projection (same discipline as h
        # below): both conv halves reference it, and materializing it
        # guarantees one md5 per token instead of trusting CSE.
        ex = ex.select(id_col, F.md5("tok").alias("m")).select(
            id_col,
            cached_expr("cast(conv(substring(m, 1, 15), 16, 10) as bigint)").alias("h1"),
            cached_expr("cast(conv(substring(m, 16, 15), 16, 10) as bigint)").alias("h2"),
        )

        def _bit(b: int) -> str:
            return f"getbit(h1, {b})" if b < 60 else f"getbit(h2, {b - 60})"

    else:
        raise ValueError(f"token_hash={token_hash!r}: expected 'xxhash64' or 'md5'")
    # sign(sum(bit*2-1)) == (2*ones > n): accumulate the raw bit counts
    # plus one token count instead of 64 sign terms — drops a multiply
    # and subtract from every (token, bit) aggregate update, the hottest
    # loop of the signature stage.
    # Built as PARSED SQL strings through the session expr cache (r5):
    # the Column-by-Column form was ~8,300 py4j round trips per build —
    # 0.9 s of pure driver latency, half this query's bench number at
    # sf0.1 — vs 65 cache lookups here. Semantics identical: same
    # getbit/sum and CASE the Column chain produced.
    sums = [cached_expr(f"sum({_bit(b)}) AS b{b}") for b in range(_BITS)]
    agg = ex.groupBy(id_col).agg(*sums, F.count(F.lit(1)).alias("__n"))
    bits = cached_expr(
        "array("
        + ", ".join(f"case when b{b}*2 > __n then 1 else 0 end" for b in range(_BITS))
        + ")"
    )
    return agg.select(id_col, bits.alias("bits"))


def _pack_block(bits: Column, block_id: Column) -> Column:
    """Pack a 16-bit slice of the bit array into an int (acc*2 + bit)."""
    block = F.slice(bits, block_id * _BLOCK_BITS + 1, _BLOCK_BITS)
    return F.aggregate(block, F.lit(0), lambda acc, x: acc * 2 + x)


def _block_spans(n_blocks: int) -> list[tuple[int, int]]:
    """(start, length) for ``n_blocks`` near-even spans covering 64 bits."""
    spans, start = [], 0
    for i in range(n_blocks):
        length = _BITS // n_blocks + (1 if i < _BITS % n_blocks else 0)
        spans.append((start, length))
        start += length
    return spans


def _hex_from_bits(bits: Column) -> Column:
    """Display form: 16 hex chars (4 packed 16-bit blocks, MSB first)."""
    parts = [
        F.lpad(F.hex(_pack_block(bits, F.lit(i))), 4, "0")
        for i in range(_N_BLOCKS - 1, -1, -1)
    ]
    return F.lower(F.concat(*parts))


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    return F.aggregate(
        F.zip_with(bits_a, bits_b, lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


# The bit-packing (_span_sql) and packed Hamming (_ham) used by
# simhash_near_duplicates live THERE as parsed SQL strings (r5: the
# Column-lambda twins of the same logic were deleted after the parsed
# migration — two parallel implementations invited silent drift).


def plan_blocking(
    n_docs: int,
    max_hamming: int,
    budget_per_doc: float = 2.0,
    max_tables: int = 64,
) -> tuple[int, int]:
    """(m, t) combinatorial blocking plan: split the fingerprint into
    ``m`` near-even spans and key candidates on every ``t``-subset of
    them (C(m, t) tables). Pigeonhole guarantee: a pair within Hamming
    ``h`` mismatches at most h spans, so it MATCHES ≥ m−h — with
    t ≤ m−h at least one chosen t-subset lies entirely inside the
    matching spans, so every true pair shares ≥ 1 bucket for ANY valid
    (m, t). The output pair set is therefore blocking-invariant;
    (m, t) only moves cost.

    Why corpus-size-aware (r5, the same lesson as srp_banding): the
    legacy single-span scheme (m = h+1, t = 1) keys on ~16 bits, and
    background collisions per doc grow as N·2^-key_bits — measured
    47/doc at 5k docs and 81/doc at 500k (40.5M candidate pairs, with
    975-doc hot buckets tripping the star guard). This is the
    multi-index idea from Manku et al.'s simhash paper (WWW'07): more
    tables buy WIDER keys, and key width is the only lever against
    N-linear per-doc collision growth. The planner picks the cheapest
    table count whose UNIFORM-model background rate
    (C(m,t) · N · 2^-key_bits) fits ``budget_per_doc``; real
    fingerprints cluster (common tokens correlate sign bits), so the
    uniform model undercounts by a data-dependent constant — the
    budget buys the growth LAW, not an exact count. Small corpora keep
    the legacy plan (the h=3 bound holds to ~32k docs), so driver-SF
    outputs and plans are unchanged.

    Key width uses the t NARROWEST spans (worst case over combos);
    t·ceil(64/m) stays ≤ 63 for every plan this emits, so a combo key
    packs into one bigint. When even the widest affordable key cannot
    meet the budget (colossal N under a small ``max_tables``), the
    plan with the lowest background rate wins — honest degradation,
    like srp_banding under its plane cap."""
    import math

    h = max_hamming
    legacy = (max(_N_BLOCKS, h + 1), 1)
    if n_docs <= 1:
        return legacy
    best = None  # (tables, m, t); fallback: lowest bg under the caps
    best_bg = None
    for m in range(max(4, h + 1), 17):
        widths = sorted(l for _, l in _block_spans(m))
        for t in range(1, m - h + 1):
            tables = math.comb(m, t)
            if tables > max_tables:
                continue
            if sum(widths[-t:]) > 63:
                # the widest combo key must pack into one SIGNED bigint;
                # a 64-bit key (e.g. t == m == 4) overflows under ANSI
                continue
            key_bits = sum(widths[:t])
            bg = tables * (n_docs - 1) * 2.0 ** (-key_bits)
            if best_bg is None or bg < best_bg[0]:
                best_bg = (bg, tables, m, t)
            if bg <= budget_per_doc and (best is None or (tables, m) < best[:2]):
                best = (tables, m, t)
    if best is not None:
        return best[1], best[2]
    if best_bg is not None:
        return best_bg[2], best_bg[3]
    return legacy  # h + 1 > 16: only the legacy split covers the radius


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """DataFrame[id, simhash_bits: array<int>, simhash: hex string]."""
    fps = simhash_bits_df(docs, id_col, text_col, token_hash=token_hash)
    return fps.select(
        id_col,
        F.col("bits").alias("simhash_bits"),
        _hex_from_bits(F.col("bits")).alias("simhash"),
    )


def simhash_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocking: tuple[int, int] | None = None,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Collision buckets for the multi-index blocking scheme:
    DataFrame[block_id, block_val, ds: array<struct<doc, pk>>] with only
    multi-doc buckets kept (``pk`` = the fingerprint packed to 4×16-bit
    words). Exposed separately from ``simhash_near_duplicates`` so the
    star-guard precondition is directly observable: the all-pairs oracle
    for the registered query is exact only while every bucket stays
    within ``max_bucket`` (see queries/dedup._simhash_oracle_sql), and
    the checked-SF assertion test measures ``size(ds)`` here instead of
    re-deriving the banding logic."""
    if max_hamming >= _BITS:
        raise ValueError(
            f"max_hamming={max_hamming} >= {_BITS}-bit fingerprint width — "
            "every pair matches; blocking is meaningless"
        )
    from itertools import combinations

    from poormans_kube_etl_spark.operators.exprcache import cached_expr

    if blocking is None:
        m, t = plan_blocking(docs.count(), max_hamming)
    else:
        m, t = blocking
        # degenerate plans fail NAMED (r7 review): t=0 passed the checks
        # below, then crashed _key_sql with a bare IndexError on the
        # empty combo; m > the fingerprint width yields zero-width spans
        # whose combo keys collapse to constants — every doc in one
        # bucket with no diagnostic
        if not 1 <= t <= m <= _BITS:
            raise ValueError(
                f"blocking={blocking}: need 1 <= t <= m <= {_BITS} "
                f"(m blocks over a {_BITS}-bit fingerprint; t >= 1 or "
                "every doc shares one bucket)"
            )
        if t > m - max_hamming:
            raise ValueError(
                f"blocking={blocking}: t must be <= m - max_hamming "
                f"({m - max_hamming}) or pairs at the radius are lost"
            )
        # mirror plan_blocking's key-pack check (ADVICE r05): the widest
        # combo key — the t WIDEST spans — must fit a signed bigint, or
        # e.g. (4, 4) at max_hamming=0 packs 64 bits and overflows under
        # ANSI at runtime
        widths = sorted(l for _, l in _block_spans(m))
        if sum(widths[-t:]) > 63:
            raise ValueError(
                f"blocking={blocking}: the {t} widest spans pack "
                f"{sum(widths[-t:])} bits > 63 — the combo key would "
                "overflow a signed bigint"
            )
    spans = _block_spans(m)
    combos = list(combinations(range(m), t))
    fps = simhash_bits_df(docs, id_col, text_col, token_hash=token_hash).withColumnRenamed(
        id_col, "doc"
    )
    # bits are packed to 4×16-bit words BEFORE the shuffle: the bucket
    # aggregation then moves 4 ints per doc instead of a 64-int array
    # (16× narrower exchange), and in-bucket Hamming is popcount(xor)
    # per word instead of a 64-element fold (measured 4.05s → sub-second
    # pair stage at sf0.1 with 9-block banding).
    # All generated expressions below are PARSED SQL through the session
    # expr cache (r5) — the lambda-HOF Column forms cost hundreds of
    # py4j round trips per build; semantics are identical term-for-term.
    def _span_sql(start: int, length: int) -> str:
        return (
            f"aggregate(slice(bits, {start + 1}, {length}), 0, "
            "(acc, x) -> acc*2 + x)"
        )

    pk_sql = (
        "array("
        + ", ".join(_span_sql(s, l) for s, l in _block_spans(_N_BLOCKS))
        + ")"
    )
    # span values materialize ONCE per doc (array sv); each combo key
    # then shift-packs its t spans from sv into one bigint — without
    # the sv projection every span aggregate would re-inline once per
    # combo that references it (t·C(m,t)/m times instead of once)
    sv_sql = "array(" + ", ".join(_span_sql(s, l) for s, l in spans) + ")"

    def _key_sql(combo: tuple[int, ...]) -> str:
        expr = f"cast(sv[{combo[0]}] as bigint)"
        for idx in combo[1:]:
            expr = f"({expr} * {1 << spans[idx][1]} + sv[{idx}])"
        return expr

    blocks_sql = (
        "explode(array("
        + ", ".join(
            f"struct({cid} as block_id, {_key_sql(c)} as block_val)"
            for cid, c in enumerate(combos)
        )
        + "))"
    )
    banded = (
        fps.select(
            "doc",
            cached_expr(pk_sql).alias("pk"),
            cached_expr(sv_sql).alias("sv"),
        )
        .select("doc", "pk", cached_expr(blocks_sql).alias("blk"))
        .select("doc", "pk", "blk.block_id", "blk.block_val")
    )
    return (
        banded.groupBy("block_id", "block_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc", "pk"))).alias("ds"))
        .where(F.size("ds") > 1)
    )


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 256,
    blocking: tuple[int, int] | None = None,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs (a, b, hamming) with Hamming distance <= max_hamming.

    Blocking: ``plan_blocking`` picks an (m, t) combinatorial scheme
    from the radius AND the corpus size — near-even spans, candidates
    keyed on every t-subset of them. By pigeonhole any pair within the
    radius agrees on ≥ m−h spans, which (t ≤ m−h) contain at least one
    chosen t-subset in full — every true pair shares a bucket, so the
    OUTPUT pair set is identical for every valid plan; corpus size
    only moves the cost curve (key width grows with log2(N), keeping
    background candidates per doc bounded instead of N-linear — the
    r5 sf10 measurement showed the fixed 16-bit single-span keys at
    40.5M candidate pairs for 500k docs). ``blocking`` forces a plan
    (tests pin the invariance with it). One plan-time ``count()`` on
    the input sizes the plan — the same index-build cost as the
    embedding-LSH path. Candidates are expanded inside each (table,
    key) bucket after a single groupBy — one narrow shuffle, no
    self-join that would recompute the fingerprint subtree on both
    sides; linear in corpus size at any fixed plan.

    Hot-bucket guard (VERDICT r01 #5): buckets larger than ``max_bucket``
    switch from O(n²) all-pairs to O(n) star linking against the bucket's
    smallest doc id (see minhash.lsh_candidate_pairs — same trade-off,
    and here each collected element also carries a 64-int bit vector, so
    unguarded buckets blow up even faster). Wider keys shrink hot
    buckets too: the sf10 975-doc bucket under 16-bit keys is ~1 doc
    expected under the 25-bit (5, 2) plan."""
    from poormans_kube_etl_spark.operators.exprcache import cached_expr

    buckets = simhash_buckets(
        docs,
        id_col=id_col,
        text_col=text_col,
        max_hamming=max_hamming,
        blocking=blocking,
        token_hash=token_hash,
    )
    _ham = (
        "aggregate(zip_with({a}, {b}, (x, y) -> bit_count(x ^ y)), 0, "
        "(acc, v) -> acc + cast(v as int))"
    )
    # in-bucket pair expansion with the threshold filter INSIDE the
    # array, before the explode: hamming is a pure function of (a, b),
    # so filtering early changes nothing semantically but the Generate
    # emits only true near-dups and the distinct below shuffles matching
    # pairs instead of every candidate pair a bucket produced
    matching_sql = (
        "filter(flatten(transform(ds, (va, i) -> "
        "transform(slice(ds, i + 2, size(ds)), vb -> "
        "struct(va.doc as a, vb.doc as b, "
        + _ham.format(a="va.pk", b="vb.pk")
        + f" as hamming)))), p -> p.hamming <= {max_hamming})"
    )
    # Star regime for oversized buckets, same struct shape, filtered
    # inside the array too. element_at(ds, 1) is referenced INSIDE the
    # per-element lambda (array access only) — the old two-branch form
    # projected it above a Generate, which copies the full multi-MB
    # ``ds`` array into every generated row (measured: OOM at 10k
    # docs); this form's generated rows are bare (a, b, hamming).
    star_sql = (
        "filter(transform(slice(ds, 2, size(ds)), m -> "
        "struct(element_at(ds, 1).doc as a, m.doc as b, "
        + _ham.format(a="element_at(ds, 1).pk", b="m.pk")
        + f" as hamming)), p -> p.hamming <= {max_hamming})"
    )
    # ONE conditional generator for both regimes (r13): the previous
    # all-pairs/star branch split consumed ``buckets`` twice, so the
    # whole fingerprint + bucket-aggregate pipeline executed once per
    # branch — a full second corpus pass bought nothing. CASE WHEN
    # picks the expansion per row (codegen evaluates branches lazily,
    # so an oversized bucket never builds its O(n²) all-pairs array);
    # each bucket falls in exactly one regime, so the pair set is
    # identical to the union form.
    expansion_sql = (
        f"case when size(ds) <= {max_bucket} then {matching_sql} "
        f"else {star_sql} end"
    )
    return (
        buckets.select(F.explode(cached_expr(expansion_sql)).alias("p"))
        .select("p.a", "p.b", "p.hamming")
        .distinct()
    )
