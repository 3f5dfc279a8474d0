"""M6 filter specs, M8 tweet cleaner, M9 stopword remover."""

import pandas as pd
import pytest

from semanticizer_ray.stages.filters import (
    clean_tweet_text,
    clean_tweets,
    compile_filter,
    filter_dataset,
    remove_stopwords,
)


def test_compile_filter_ops(ray_session):
    import pyarrow as pa

    t = pa.table({"x": [0.1, 0.5, 0.9], "name": ["a", "b", "c"]})
    assert compile_filter("x >= 0.5")(t).num_rows == 2
    assert compile_filter("x < 0.5")(t).num_rows == 1
    assert compile_filter("x >= 0.2, x < 0.9")(t).num_rows == 1
    assert compile_filter("name = b")(t).num_rows == 1
    assert compile_filter("name != b")(t).num_rows == 2
    with pytest.raises(ValueError):
        compile_filter("garbage ~~~ 3")


def test_filter_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"v": [1, 2, 3, 4]}))
    out = filter_dataset(ds, "v > 2").to_pandas()
    assert sorted(out["v"]) == [3, 4]


def test_clean_tweet_text():
    assert clean_tweet_text("RT @bob: check https://x.co/y #cool stuff") == ": check cool stuff"
    assert clean_tweet_text("no noise here") == "no noise here"
    assert clean_tweet_text("") == ""


def test_clean_tweets_keeps_text(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"text": ["RT @a hello #world", "plain"]})
    out = clean_tweets(rd.from_pandas(df)).to_pandas()
    assert list(out["text"]) == list(df["text"])  # raw text untouched
    assert list(out["clean_text"]) == ["hello world", "plain"]


def test_remove_stopwords(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"text": ["the quick Brown fox THE end", ""]})
    out = remove_stopwords(rd.from_pandas(df), {"the", "end"}).to_pandas()
    assert list(out["content_text"]) == ["quick Brown fox", ""]
