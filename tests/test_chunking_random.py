"""Property test for overlapping token-window chunking: for random
texts and (window, stride) configs the chunk set must (a) cover every
token, (b) start at exactly 1 + k·stride, (c) overlap consecutive full
chunks by window−stride, (d) reassemble to the original token sequence
from the non-overlapped prefixes plus the last chunk's tail."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.operators.chunking import chunk_documents

words = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=40
)


@st.composite
def configs(draw):
    window = draw(st.integers(min_value=2, max_value=12))
    stride = draw(st.integers(min_value=1, max_value=window))
    return window, stride


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens_list=st.lists(words, min_size=1, max_size=5), cfg=configs())
def test_chunk_invariants(spark, tmp_path_factory, tokens_list, cfg):
    window, stride = cfg
    sf_dir = str(tmp_path_factory.mktemp("chunks"))
    rows = [(i, " ".join(toks)) for i, toks in enumerate(tokens_list)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    out = chunk_documents(spark, sf_dir, window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    for doc_id, toks in enumerate(tokens_list):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        n = len(toks)
        # (b) starts form the arithmetic progression
        assert [c.start_token for c in chunks] == [
             1 + k * stride for k in range(len(chunks))
        ]
        # (a) full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last.start_token + last.n_tokens - 1 >= n
        # minimality: second-to-last chunk does NOT already cover all
        if len(chunks) > 1:
            prev = chunks[-2]
            assert prev.start_token + window - 1 < n
        # (c)+(d) token-exact reassembly
        rebuilt: list[str] = []
        for c in chunks:
            piece = c.chunk_text.split(" ") if c.chunk_text else []
            assert len(piece) == c.n_tokens
            rebuilt.extend(piece[len(rebuilt) - (c.start_token - 1) :])
        assert rebuilt == toks
