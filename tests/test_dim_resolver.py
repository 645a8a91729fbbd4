"""Embedding-dimension resolution (dim_resolver.cpp) — scalar twins +
Catalyst column cascade."""

from __future__ import annotations

from yams_spark.functions.embed_models import (
    dim_from_model_config,
    dim_from_model_config_col,
    dim_from_model_name,
    dim_from_model_name_col,
    resolve_dim,
    resolve_dim_col,
)


def test_dim_from_model_name():
    assert dim_from_model_name("all-MiniLM-L6-v2") == 384
    assert dim_from_model_name("paraphrase-MPNet-base") == 768
    assert dim_from_model_name("BGE-Large-en") == 1024
    assert dim_from_model_name("e5-small-v2") == 384
    assert dim_from_model_name("EmbeddingGemma-300m") == 768
    assert dim_from_model_name("custom-model") is None
    assert dim_from_model_name("") is None
    # first match in the reference's check order wins (:21-43)
    assert dim_from_model_name("minilm-mpnet-hybrid") == 384
    assert dim_from_model_name("mpnet-bge-large") == 768


def test_dim_from_model_config():
    assert dim_from_model_config('{"hidden_size": 384}') == 384
    assert dim_from_model_config(
        '{"hidden_size": 384, "dim": 999}'
    ) == 384
    assert dim_from_model_config('{"output_embedding_size": 512}') == 512
    assert dim_from_model_config('{"dim": 256}') == 256
    # is_number_integer gate: floats and bools don't count (:60-66)
    assert dim_from_model_config('{"dim": 768.5}') is None
    assert dim_from_model_config('{"dim": true}') is None
    assert dim_from_model_config("{bad json") is None
    assert dim_from_model_config(None) is None


def test_resolve_dim_cascade():
    assert resolve_dim(512, 384, 128) == 512
    assert resolve_dim(None, 384, 128) == 384
    assert resolve_dim(None, 0, 128) == 128


def test_columns_match_scalars(spark):
    names = [
        "all-MiniLM-L6-v2", "paraphrase-mpnet-base", "BGE-Large-en",
        "e5-small-v2", "custom-model", "", "minilm-mpnet-hybrid",
        "EmbeddingGemma-300m", "nomic-embed-text", "jina-embeddings-v2",
        "bge-small-en", "e5-base-unsup", "e5-large-instruct",
        "bge-base-en",
    ]
    configs = [
        '{"hidden_size": 384}', '{"output_embedding_size": 512}',
        '{"dim": 256}', '{"dim": 768.5}', "{bad json", None,
        '{"hidden_size": 1024, "dim": 3}',
    ]
    rows = [
        (i, names[i % len(names)], configs[i % len(configs)],
         (i % 7) if i % 3 == 0 else None, i % 5)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "i int, name string, cfg string, sentinel int, gen int"
    )
    got = df.select(
        "i", "name", "cfg", "sentinel", "gen",
        dim_from_model_name_col("name").alias("nd"),
        dim_from_model_config_col("cfg").alias("cd"),
        resolve_dim_col("sentinel", "gen", 384).alias("rd"),
    ).collect()
    for r in got:
        assert r["nd"] == dim_from_model_name(r["name"]), r["name"]
        assert r["cd"] == dim_from_model_config(r["cfg"]), r["cfg"]
        assert r["rd"] == resolve_dim(r["sentinel"], r["gen"], 384)
