"""Differential tests for the distributed BPE trainer: the Spark merge loop
must reproduce a pure-Python reference BPE (Sennrich-style, greedy
left-to-right apply, lexicographic tie-break) exactly, merge for merge."""


def _ref_bpe(word_freqs, n_merges, min_pair_freq=2):
    vocab = {}
    for w, f in word_freqs.items():
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (l, r), c = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if c < min_pair_freq:
            break
        merges.append((l, r, c))
        new = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            k = tuple(out)
            new[k] = new.get(k, 0) + f
        vocab = new
    return merges


def test_bpe_train_matches_python_reference(spark, sf_smoke):
    from database_migration_spark.operators.text import bpe_train, word_frequencies
    from database_migration_spark.sources.parquet_source import (
        read_parquet_portable,
    )

    docs = read_parquet_portable(spark, f"{sf_smoke}/documents.parquet")
    wf = {r.term: r.freq for r in word_frequencies(docs, persist=False).collect()}
    got = bpe_train(docs, n_merges=12)
    want = _ref_bpe(wf, 12)
    assert got == want
    assert len(got) == 12  # the smoke corpus has ≥12 frequent pairs
    # merged tokens really are multi-character units
    assert any(len(l + r) > 2 for l, r, _ in got)
    spark.catalog.clearCache()


def test_bpe_merge_table_shape_and_determinism(spark, sf_smoke):
    from database_migration_spark.operators.text import bpe_merge_table
    from database_migration_spark.sources.parquet_source import (
        read_parquet_portable,
    )

    docs = read_parquet_portable(spark, f"{sf_smoke}/documents.parquet")
    a = bpe_merge_table(docs, n_merges=6).collect()
    b = bpe_merge_table(docs, n_merges=6).collect()
    assert a == b  # byte-identical across runs
    assert [r.merge_ord for r in a] == list(range(1, 7))
    assert all(r.pair_freq >= 2 for r in a)
    spark.catalog.clearCache()


def _ref_apply(word, merges):
    out = list(word) + ["</w>"]
    for l, r, *_ in merges:
        new = []
        for s in out:
            if new and new[-1] == l and s == r:
                new[-1] = l + r
            else:
                new.append(s)
        out = new
    return out


def test_bpe_tokenize_matches_python_apply(spark, sf_smoke):
    """Train on the corpus, apply to the corpus: per-doc subword counts
    must equal the Python reference applying the same merge list to the
    same token stream."""
    from database_migration_spark.operators.text import (
        bpe_tokenize,
        bpe_train,
        term_frequencies,
    )
    from database_migration_spark.sources.parquet_source import (
        read_parquet_portable,
    )

    docs = read_parquet_portable(spark, f"{sf_smoke}/documents.parquet").limit(50)
    merges = bpe_train(docs, n_merges=10)
    got = {
        (r.doc_id, r.subword): r.n for r in bpe_tokenize(docs, merges).collect()
    }

    tf = term_frequencies(docs, persist=False).collect()
    want: dict = {}
    seg_cache: dict = {}
    for r in tf:
        if r.term not in seg_cache:
            seg_cache[r.term] = _ref_apply(r.term, merges)
        for sub in seg_cache[r.term]:
            want[(r.id, sub)] = want.get((r.id, sub), 0) + r.tf
    assert got == want and got
    # the learned merges actually fire: some subwords are multi-char units
    assert any(len(sub.replace("</w>", "")) > 1 for _, sub in got)
    spark.catalog.clearCache()
