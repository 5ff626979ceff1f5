"""BPE vocabulary interchange (operators/bpe.py, r8 session D):
merges.txt round-trip in the subword-nmt/HF format, vocab.json id
assignment, and the corpus-alphabet pass — so a vocabulary trained here
loads into an existing tokenizer stack."""

import pytest

from seafowl_spark.operators.bpe import (
    bpe_encode,
    corpus_alphabet,
    learn_bpe,
    merges_from_text,
    merges_to_text,
    vocab_from_merges,
)


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide widest lower",
    ]
    return spark.createDataFrame([(t,) for t in texts], "text string")


class TestMergesInterchange:
    def test_round_trip(self, spark, corpus):
        merges = learn_bpe(corpus, n_merges=12, route="local")
        assert merges  # corpus is mergeable
        text = merges_to_text(merges)
        assert text.startswith("#version:")
        assert merges_from_text(text) == merges

    def test_malformed_line_rejected(self):
        with pytest.raises(ValueError, match="malformed"):
            merges_from_text("a b c\n")
        with pytest.raises(ValueError, match="malformed"):
            merges_from_text("justone\n")

    def test_vocab_ids_alphabet_then_rank_order(self, spark, corpus):
        merges = learn_bpe(corpus, n_merges=8, route="local")
        alpha = corpus_alphabet(corpus)
        vocab = vocab_from_merges(merges, alpha)
        n_alpha = len(set(alpha))
        # alphabet occupies the low ids, sorted
        alpha_ids = [vocab[a] for a in sorted(set(alpha))]
        assert alpha_ids == list(range(n_alpha))
        # merge products follow in rank order (skipping dupes)
        prev = n_alpha - 1
        for a, b in merges:
            assert vocab[a + b] >= prev or vocab[a + b] < n_alpha
            prev = max(prev, vocab[a + b])

    def test_every_encoded_token_has_an_id(self, spark, corpus):
        merges = learn_bpe(corpus, n_merges=10, route="local")
        vocab = vocab_from_merges(merges, corpus_alphabet(corpus))
        enc = bpe_encode(corpus, merges)
        toks = {
            t
            for r in enc.select("bpe_tokens").collect()
            for t in r["bpe_tokens"]
        }
        missing = toks - set(vocab)
        assert missing == set()

    def test_hash_left_symbol_round_trips(self):
        m = [("#", "t"), ("#t", "ag</w>")]
        assert merges_from_text(merges_to_text(m)) == m
