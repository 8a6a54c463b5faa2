"""Compile/construct smoke coverage for the import-gated real
backends (VERDICT r2 #7): these paths never execute in this sandbox
(no torch / transformers / sentence-transformers / PIL), so each gets
(a) a skipif-marked construction+call smoke that runs wherever the
libs ARE present, and (b) a sandbox-runnable assertion that the
import gate raises the documented NotImplementedError — the gate
contract itself is pinned either way.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
import pytest

from knowledge_graph_creation_from_text_with_llms_spark.functions import embeddings
from knowledge_graph_creation_from_text_with_llms_spark.operators import (
    extractor,
    multimodal,
)

_HAS_TRANSFORMERS = (
    importlib.util.find_spec("transformers") is not None
    and importlib.util.find_spec("torch") is not None
)
_HAS_ST = importlib.util.find_spec("sentence_transformers") is not None


@pytest.mark.skipif(not _HAS_TRANSFORMERS, reason="torch/transformers not installed")
def test_hf_causal_backend_smoke():
    """Construct the HF backend on a tiny model and run one batch:
    exercises the left-padding config and the token-id prompt strip
    (extractor.py) that are otherwise dead code in the sandbox."""
    be = extractor.HFCausalBackend(
        model_name="sshleifer/tiny-gpt2",
        generate_params={"max_new_tokens": 4, "do_sample": False},
    )
    assert be.tokenizer.padding_side == "left"
    out = be.generate(pd.Series(["alpha beta", "a much longer prompt text here"]))
    assert len(out) == 2
    # the prompt must be stripped from the continuation
    assert not out.iloc[0].startswith(extractor.DEFAULT_SYSTEM_MESSAGE)


def test_hf_causal_backend_gate_without_libs():
    if _HAS_TRANSFORMERS:
        pytest.skip("transformers present: gate not reachable")
    with pytest.raises(NotImplementedError, match="RuleBasedBackend"):
        extractor.HFCausalBackend()


@pytest.mark.skipif(not _HAS_ST, reason="sentence-transformers not installed")
def test_sentence_encoder_smoke():
    be = embeddings.SentenceEncoderBackend()
    vecs = be.encode(["hello world", "spark graft"])
    assert vecs.shape[0] == 2 and vecs.shape[1] > 0


def test_sentence_encoder_gate_without_libs():
    if _HAS_ST:
        pytest.skip("sentence-transformers present: gate not reachable")
    with pytest.raises(NotImplementedError, match="hash_embedding_expr"):
        embeddings.SentenceEncoderBackend()


def test_library_decoder_and_resizer_are_documented_stubs():
    """The library decode/resize paths are explicit stubs (media libs
    don't ship here): they must raise the documented error, and the
    deterministic stand-ins must satisfy the same interface."""
    with pytest.raises(NotImplementedError, match="DeterministicFakeDecoder"):
        multimodal.LibraryDecoder().features(b"x")
    with pytest.raises(NotImplementedError, match="DeterministicFakeResizer"):
        multimodal.LibraryResizer().resize(b"x", 2, 2)
    feats = multimodal.DeterministicFakeDecoder().features("payload")
    assert len(feats) == multimodal.FEATURE_DIM
    assert multimodal.DeterministicFakeResizer().resize("p", 4, 4)
