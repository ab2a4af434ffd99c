"""The testable half of the env-gated hf scorer backend: marker-token
vocabulary addition and sep-vs-uni encode assembly (reference
src/task.py:192-196, src/data_utils.py:58-88) run WITHOUT the
torch/transformers wheels — only the `torch.no_grad` forward itself stays
environment-gated."""

from __future__ import annotations

from clinicaltransformerrelationextraction_spark.config import (
    SPEC_TAGS,
    PipelineConfig,
)
from clinicaltransformerrelationextraction_spark.operators.scoring import (
    hf_add_marker_tokens,
    hf_encode_args,
)


class FakeTokenizer:
    """Records the add_tokens/__call__ surface the hf backend drives."""

    def __init__(self):
        self.added: list[str] = []
        self.calls: list[tuple[tuple, dict]] = []

    def add_tokens(self, toks):
        new = [t for t in toks if t not in self.added]
        self.added.extend(new)
        return len(new)

    def __call__(self, *args, **kwargs):
        self.calls.append((args, kwargs))
        return {"input_ids": None}


def test_marker_tokens_added_once():
    tok = FakeTokenizer()
    assert hf_add_marker_tokens(tok) == 4
    assert tok.added == ["[s1]", "[e1]", "[s2]", "[e2]"] == list(SPEC_TAGS)
    # idempotent on a vocabulary that already has them (re-init on a
    # cached model dir must not grow the embedding matrix again)
    assert hf_add_marker_tokens(tok) == 0


def test_sep_mode_encodes_as_pair():
    s1 = ["aspirin [s1] dose [e1]", "x"]
    s2 = ["[s2] nausea [e2] later", "y"]
    args, kwargs = hf_encode_args(s1, s2, data_format_mode=0,
                                  max_seq_len=512)
    # pair form -> tokenizer inserts [CLS] s1 [SEP] s2 [SEP] itself
    assert args == (s1, s2)
    assert kwargs["truncation"] is True
    assert kwargs["max_length"] == 512
    assert kwargs["padding"] is True
    assert kwargs["return_tensors"] == "pt"


def test_uni_mode_encodes_one_sequence():
    s1 = ["a b", "c"]
    s2 = ["d", "e f"]
    args, kwargs = hf_encode_args(s1, s2, data_format_mode=1,
                                  max_seq_len=128)
    assert args == (["a b d", "c e f"],)
    assert kwargs["max_length"] == 128 and kwargs["truncation"] is True


def test_config_mode_routes_assembly():
    """The same cfg fields the Spark plumbing passes select the shape."""
    for mode, n_args in ((0, 2), (1, 1)):
        cfg = PipelineConfig(data_format_mode=mode, max_seq_len=64)
        args, kwargs = hf_encode_args(["s"], ["t"], cfg.data_format_mode,
                                      cfg.max_seq_len)
        assert len(args) == n_args
        assert kwargs["max_length"] == 64


def test_fake_tokenizer_invocation_shape():
    """End-to-end of the factored half: what the scorer would call."""
    tok = FakeTokenizer()
    hf_add_marker_tokens(tok)
    args, kwargs = hf_encode_args(["p [s1] q [e1]"], ["[s2] r [e2]"], 0, 512)
    tok(*args, **kwargs)
    (got_args, got_kwargs), = tok.calls
    assert got_args == (["p [s1] q [e1]"], ["[s2] r [e2]"])
    assert got_kwargs["truncation"] and got_kwargs["max_length"] == 512
