"""Text-analysis column expressions (north-star extension X5; SURVEY.md §2.10).

All pure ``pyspark.sql.functions`` compositions — array/lambda higher-order
functions run JVM-side inside codegen, so these scale to a 100 TB documents
table with zero Python-worker traffic. DuckDB-oracle equivalents live in
``plans/oracles.py``; formulas here are written so both engines execute the
same arithmetic in the same order (hash-stable results).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization: ``split(text, ' ')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_tokens(text: str | Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def shingles_from_tokens(toks: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a *materialized* token-array column.

    ``transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(toks, i, n)))``
    — all JVM-side. Documents shorter than ``n`` tokens yield an empty array
    (guarded: Spark's ``sequence(1, 0)`` would count *down*).

    IMPORTANT perf contract: pass an attribute (a column produced by a prior
    ``select``), not an inline ``split(...)`` expression. Higher-order
    functions are interpreted (no codegen), and an inline split would be
    re-evaluated for every lambda element — measured ~30x slowdown on the
    near-dup pipeline. Catalyst's CollapseProject keeps multi-referenced
    non-trivial aliases materialized, so a two-step select is enough.
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(empty)


def shingles(text: str | Column, n: int = 3) -> Column:
    """Shingles straight from a text column — convenience form for one-shot
    expressions. Hot paths should materialize tokens first and use
    :func:`shingles_from_tokens` (see its perf contract)."""
    return shingles_from_tokens(tokens(text), n)


def avg_token_len(text: str | Column) -> Column:
    """Mean token length = chars-excluding-spaces / token count. Written this
    way (rather than aggregate over per-token lengths) so the DuckDB oracle
    can reproduce it bit-for-bit."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(c, " ", "")) / token_count(c)


def type_token_ratio(text: str | Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return F.size(distinct_tokens(text)) / token_count(text)


def quality_score(text: str | Column) -> Column:
    """Heuristic document-quality score in [0, 1] — the length / diversity /
    token-shape blend a pretraining-data filter would use:

        0.4 * min(n_tokens/100, 1)      (enough content)
      + 0.3 * type_token_ratio          (not degenerate repetition)
      + 0.3 * min(avg_token_len/8, 1)   (real words, not fragments)
    """
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    return (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.size(distinct_tokens(c)).cast("double") / n)
        + F.lit(0.3) * F.least(avg_token_len(c) / F.lit(8.0), F.lit(1.0))
    )


#: PII patterns for corpus scrubbing, written to the COMMON subset of the
#: Java (Spark) and RE2 (DuckDB oracle) regex dialects — explicit character
#: classes, no lookaround, no lazy quantifiers — so masking is engine-exact.
#: Masking order matters and is fixed: URLs first (they may embed dots and
#: digit runs), then emails, then bare IPv4s.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[A-Za-z0-9./_%-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def mask_pii(text: str | Column) -> Column:
    """Scrub PII spans (URLs, emails, IPv4s) to typed placeholder tokens —
    the redaction pass an LLM data pipeline runs before training. One
    chained regexp_replace per pattern, all JVM-side; the oracle applies
    the identical chain with RE2."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts over the ORIGINAL text (so counts are
    independent of masking order)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


#: Payment-card candidate patterns (round 15 — the checksum-validated
#: member of the PII family): contiguous 13-19 digit PANs and 4-4-4-4
#: groupings with space or dash separators. Same dialect rules as
#: PII_PATTERNS (no lookaround, no backreferences — RE2 has neither, and
#: a backreference is what it would take to force one CONSISTENT
#: separator, so mixed separators are accepted and documented). Unlike
#: the regex-only PII kinds, a digit run is only PII if the Luhn
#: checksum holds — an order id or timestamp that happens to be 16
#: digits must NOT be masked (the false-positive direction destroys
#: non-PII data).
#:
#: The grouped pattern matches the WHOLE separator-delimited run
#: (``{3,}`` not ``{3}``): anchoring a fixed 4-group window at the
#: run's first boundary would extract the WRONG 16-digit window from a
#: longer run ('ref 1234 4539 1488 0343 6467' — the true PAN starts at
#: group 2) and the real card would leak through the redaction pass.
#: :func:`card_candidates` slides a 4-group window over each extracted
#: run instead, so every aligned 16-digit window is a candidate.
CARD_CANDIDATE_PATTERNS: tuple[str, ...] = (
    r"\b\d{13,19}\b",
    r"\b\d{4}(?:[ -]\d{4}){3,}\b",
)


def card_candidates(text: str | Column) -> Column:
    """``array<string>`` of card-shaped substrings of ``text``
    (de-duplicated). Contiguous 13-19 digit runs come straight from the
    regex; grouped runs are extracted whole and every aligned 4-group
    window is emitted (each group+separator is exactly 5 chars, so
    window ``i`` is ``substr(i*5+1, 19)`` — original separators
    preserved, so a window is a literal substring of ``text`` and
    :func:`mask_valid_cards` can replace it). Candidates only — run
    :func:`luhn_valid` before treating one as PII."""
    c = F.col(text) if isinstance(text, str) else text
    contiguous = F.regexp_extract_all(
        c, F.lit(CARD_CANDIDATE_PATTERNS[0]), F.lit(0)
    )
    runs = F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_PATTERNS[1]), F.lit(0))
    # a run of g groups has length 5g-1 and g-3 aligned 4-group windows
    windows = F.flatten(
        F.transform(
            runs,
            lambda s: F.transform(
                F.sequence(F.lit(0), ((F.length(s) - 19) / 5).cast("int")),
                lambda i: s.substr(i * F.lit(5) + F.lit(1), F.lit(19)),
            ),
        )
    )
    return F.array_distinct(F.concat(contiguous, windows))


def luhn_valid(cand: Column) -> Column:
    """Boolean: the digit string in ``cand`` passes the Luhn checksum
    (ISO/IEC 7812 — double every second digit from the right, subtract 9
    above 9, sum divisible by 10). Pure integer JVM expressions; the
    HOF lambdas here run per CANDIDATE (a handful per document), not per
    corpus row, so the interpreted-lambda cost note in this module's
    normalize docstring does not bite."""
    digits = F.filter(
        F.split(F.reverse(F.regexp_replace(cand, r"[^0-9]", "")), ""),
        lambda ch: ch != F.lit(""),
    )
    vals = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    return F.aggregate(vals, F.lit(0), lambda acc, v: acc + v) % 10 == 0


def card_counts(text: str | Column) -> dict[str, Column]:
    """``{'card_candidates': n, 'card_valid': n}`` over the original
    text — the audit counts (how many digit runs look like cards; how
    many actually checksum)."""
    cands = card_candidates(text)
    return {
        "card_candidates": F.size(cands),
        "card_valid": F.size(F.filter(cands, luhn_valid)),
    }


def mask_valid_cards(text: str | Column, token: str = "<CARD>") -> Column:
    """Replace every Luhn-VALID card candidate with ``token``, leaving
    checksum-failing digit runs (order ids, serials) untouched — the
    conservative direction for a redaction pass over training data.
    Literal replaces folded over the (tiny) valid-candidate array."""
    c = F.col(text) if isinstance(text, str) else text
    valid = F.filter(card_candidates(c), luhn_valid)
    return F.aggregate(
        valid, c, lambda acc, cand: F.replace(acc, cand, F.lit(token))
    )


#: IBAN candidate shape (ISO 13616): two country letters, two check
#: digits, 11-30 alphanumerics — the union of real national lengths
#: (15 Norway .. 34 max). Shape only; :func:`iban_valid` decides.
#: Same regex dialect rules as PII_PATTERNS (no lookaround — RE2-safe).
IBAN_CANDIDATE_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"


def iban_candidates(text: str | Column) -> Column:
    """``array<string>`` of IBAN-shaped substrings (de-duplicated).
    Candidates only — run :func:`iban_valid` before treating one as
    PII (a tracking code can match the shape; the mod-97 checksum is
    the decider, exactly the Luhn split for cards)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.regexp_extract_all(c, F.lit(IBAN_CANDIDATE_RE), F.lit(0))
    )


def iban_valid(cand: Column) -> Column:
    """Boolean: ``cand`` passes the ISO 13616 / ISO 7064 mod-97 check —
    move the first four chars to the end, map ``A-Z`` to ``10-35``, and
    the resulting big integer must be ``== 1 (mod 97)``. The number
    (up to 36 digits) never materializes: the fold keeps a running
    remainder — ``(acc*10 + digit) % 97`` per digit, ``(acc*100 +
    value) % 97`` per letter — in pure integer JVM expressions, the
    exact chunked-mod recipe the standard prescribes for 32-bit
    machines. Runs per CANDIDATE like :func:`luhn_valid`; country-
    specific length tables are deliberately out of scope (documented —
    the checksum catches transposition/typo damage regardless)."""
    rearranged = F.concat(F.substring(cand, 5, 1_000_000), F.substring(cand, 1, 4))
    chars = F.filter(F.split(rearranged, ""), lambda ch: ch != F.lit(""))
    acc = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.when(
            ch.rlike("[A-Z]"),
            (acc * 100 + (F.ascii(ch) - 55).cast("bigint")) % 97,
        ).otherwise((acc * 10 + ch.cast("bigint")) % 97),
    )
    return (F.length(cand) >= 15) & (acc == 1)


def iban_counts(text: str | Column) -> dict[str, Column]:
    """``{'iban_candidates': n, 'iban_valid': n}`` over the original
    text — the audit counts, symmetric with :func:`card_counts`."""
    cands = iban_candidates(text)
    return {
        "iban_candidates": F.size(cands),
        "iban_valid": F.size(F.filter(cands, iban_valid)),
    }


def mask_valid_ibans(text: str | Column, token: str = "<IBAN>") -> Column:
    """Replace every mod-97-VALID IBAN candidate with ``token``,
    leaving checksum-failing shape-alikes (tracking codes, serials)
    untouched — the same conservative direction as
    :func:`mask_valid_cards`."""
    c = F.col(text) if isinstance(text, str) else text
    valid = F.filter(iban_candidates(c), iban_valid)
    return F.aggregate(
        valid, c, lambda acc, cand: F.replace(acc, cand, F.lit(token))
    )


#: UTF-8 text misdecoded as Latin-1 (the classic double-encoding rot a
#: crawl corpus carries): every two-byte UTF-8 sequence for U+00C0-U+00FF
#: (the accented Latin-1 block — é è ü ñ ç ...) turns into 'Ã' followed
#: by a char in U+0080-U+00BF. That pair is the closed-form marker: 'Ã'
#: followed by a C1-control/supplement char is vanishingly rare in clean
#: text (legitimate 'Ã' is followed by a letter, as in 'São' -> 'Ã' never
#: appears; mojibake 'SÃ£o' puts U+00A3 after it).
MOJIBAKE_MARKER_RE = "\u00c3[\u0080-\u00bf]"


def mojibake_count(text: str | Column) -> Column:
    """Count of UTF-8-as-Latin-1 marker pairs — the detection signal; a
    codegen'd regexp_count, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(MOJIBAKE_MARKER_RE))


def repair_mojibake(text: str | Column) -> Column:
    """Undo one round of UTF-8-read-as-Latin-1: re-encode the string as
    Latin-1 bytes (recovering the original UTF-8 byte stream) and decode
    as UTF-8 — the exact inverse, full fidelity for ANY damaged
    codepoint, not a lookup table. Guarded three ways so it never
    corrupts a clean row: the marker must be present, every char must be
    Latin-1-encodable (chars above U+00FF mean the text was NOT produced
    by a Latin-1 misdecode), and the recovered bytes must be valid UTF-8
    (``is_valid_utf8`` — a truncated trailing sequence falls back to the
    original). All JVM expressions; CASE branches evaluate lazily so the
    charset ops never run on unguarded rows."""
    c = F.col(text) if isinstance(text, str) else text
    recovered = F.encode(c, "ISO-8859-1")
    return F.when(
        (F.regexp_count(c, F.lit(MOJIBAKE_MARKER_RE)) > 0)
        & c.rlike("^[\u0000-\u00ff]*$")
        & F.is_valid_utf8(recovered),
        F.decode(recovered, "UTF-8"),
    ).otherwise(c)


def normalize_text_batch(df, text_col: str = "text", out_col: str = "clean_text"):
    """Unicode text normalization (X5 corpus hygiene) — the cleaning pass
    web-crawl pipelines run before any tokenization: NFC canonical
    composition (combining sequences -> precomposed forms, so visually
    identical strings hash identically for dedup), C0/C1 control-char
    strip (tab/newline normalize to space first), whitespace-run
    collapse, and trim.

    NFC has no JVM builtin in Spark SQL, so the composition step is an
    Arrow-batched Pandas stage over ``unicodedata`` (the same Unicode
    standard utf8proc implements — the q73 oracle cross-checks the two
    implementations span for span via md5). Map-only; everything after
    the normalize is vectorized pandas ``str`` ops.
    """
    import pandas as pd

    def batches(it):
        import re
        import unicodedata

        ctrl = re.compile(r"[\x00-\x08\x0B-\x1F\x7F-\x9F]")
        ws = re.compile(r" {2,}")

        def clean(s):
            if s is None:
                return None
            s = unicodedata.normalize("NFC", str(s))
            s = s.replace("\t", " ").replace("\n", " ").replace("\r", " ")
            s = ctrl.sub("", s)
            s = ws.sub(" ", s)
            return s.strip()

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [clean(v) for v in pdf[text_col]], index=pdf.index, dtype=object
            )
            yield pdf

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(batches, f"{fields}, {out_col} string")


#: script name -> codepoint-range character class (round 14). A
#: deliberate closed-form subset of Unicode script properties — ranges,
#: not \\p{Script=...} classes, so the same pattern means the same thing
#: in Java regex, RE2, and any oracle engine.
SCRIPT_RANGES = {
    "arabic": "[؀-ۿ]",
    "cyrillic": "[Ѐ-ӿ]",
    "devanagari": "[ऀ-ॿ]",
    "greek": "[Ͱ-Ͽ]",
    "han": "[一-鿿]",
    "hangul": "[가-힯]",
    "kana": "[぀-ヿ]",
    "latin": "[A-Za-z]",
}


def script_counts(text: str | Column) -> dict[str, Column]:
    """Per-script character counts (``regexp_count`` over the range
    classes above) — codegen'd JVM expressions, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(c, F.lit(rng)).alias(f"n_{name}")
        for name, rng in SCRIPT_RANGES.items()
    }


def dominant_script(text: str | Column, out_col: str = "script") -> Column:
    """The script with the most characters; ties break alphabetically
    (max over (count, reversed-name) structs — deterministic); a text
    with NO script characters yields ``'none'``. The cheap router in
    front of per-language processing (the lang-ID operator reads TEXT
    features; this reads the codepoint layer and needs no fit)."""
    c = F.col(text) if isinstance(text, str) else text
    entries = [
        # name sorts DESC inside max() so the alphabetically-FIRST name
        # wins count ties: compare on (count, negated name rank)
        F.struct(
            F.regexp_count(c, F.lit(rng)).alias("n"),
            F.lit(-i).alias("r"),
            F.lit(name).alias("s"),
        )
        for i, (name, rng) in enumerate(sorted(SCRIPT_RANGES.items()))
    ]
    best = F.greatest(*entries)
    return F.when(best.getField("n") > 0, best.getField("s")).otherwise(
        F.lit("none")
    ).alias(out_col)


#: The MassiveText stop-word list (Rae et al. 2021, Appendix A): a doc
#: must contain at least 2 of these to pass the stop-word rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(df, text_col: str = "text"):
    """Append the MassiveText quality-rule booleans (Rae et al. 2021
    "Scaling Language Models: ... Gopher", Appendix A) — the standard
    pretraining heuristic filter — plus a ``g_pass`` conjunction.

    Every rule is an EXACT-INTEGER comparison (ratios cross-multiplied,
    never divided) so any engine replays the verdicts bit-for-bit:

      ``g_nwords``     50 <= words <= 100,000
      ``g_wordlen``    3*words <= chars-excluding-whitespace <= 10*words
                       (mean word length in [3, 10])
      ``g_symbols``    10 * (# + ellipsis occurrences) <= words
      ``g_ellipsis``   10 * lines-ending-in-"..." <= 3 * lines  (<= 30%)
      ``g_bullets``    10 * lines-starting-with-bullet <= 9 * lines
      ``g_alpha``      5 * words-containing-a-letter >= 4 * words (>= 80%)
      ``g_stopwords``  at least 2 DISTINCT stop words present

    Words are non-empty ``[ \\n]``-separated runs; lines are ``\\n``
    splits. Both arrays are materialized ONCE per doc and the lambda
    filters run over attributes (the HOF perf contract documented on
    :func:`shingles_from_tokens`) — all JVM-side, map-only, no UDF.
    """
    c = F.col(text_col)
    pre = df.withColumn(
        "__gw", F.filter(F.split(c, "[ \n]"), lambda w: w != "")
    ).withColumn("__gl", F.split(c, "\n"))
    w, l = F.col("__gw"), F.col("__gl")
    n = F.size(w)
    nl = F.size(l)
    chars = F.length(F.regexp_replace(c, "[ \n]", ""))
    symbols = F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ell = F.size(F.filter(l, lambda x: x.rlike(r"\.\.\.$")))
    bullets = F.size(F.filter(l, lambda x: x.rlike(r"^[-*•]")))
    alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    stops = sum(
        F.array_contains(w, s).cast("int") for s in GOPHER_STOPWORDS
    )
    out = (
        pre.withColumn("g_nwords", (n >= 50) & (n <= 100000))
        .withColumn("g_wordlen", (chars >= 3 * n) & (chars <= 10 * n))
        .withColumn("g_symbols", 10 * symbols <= n)
        .withColumn("g_ellipsis", 10 * ell <= 3 * nl)
        .withColumn("g_bullets", 10 * bullets <= 9 * nl)
        .withColumn("g_alpha", 5 * alpha >= 4 * n)
        .withColumn("g_stopwords", stops >= 2)
    )
    flags = [
        "g_nwords", "g_wordlen", "g_symbols", "g_ellipsis",
        "g_bullets", "g_alpha", "g_stopwords",
    ]
    passed = F.lit(True)
    for f in flags:
        passed = passed & F.col(f)
    return out.withColumn("g_pass", passed).drop("__gw", "__gl")
