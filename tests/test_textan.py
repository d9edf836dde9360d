

def test_importance_weights_ranks_target_like_docs_higher(spark):
    """A doc written in target-distinctive vocabulary outscores a doc of
    corpus-common vocabulary; tokens absent from both LMs are impossible
    (scoring joins the corpus LM built from the scored corpus itself)."""
    from sparkgatha.textan import importance_weights

    corpus = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance"),   # target-like
            (2, "mundane filler boilerplate chatter"),  # corpus-like
            (3, "mundane filler boilerplate chatter"),
            (4, "mundane filler boilerplate chatter"),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(9, "quantum flux capacitor resonance quantum flux")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.log_ratio
            for r in importance_weights(corpus, target).collect()}
    assert rows[1] > rows[2]
    assert rows[2] == rows[3] == rows[4]
    import pytest

    with pytest.raises(ValueError):
        importance_weights(corpus, target, smoothing=0.0)
