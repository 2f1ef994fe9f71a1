"""Pin the vectorized text kernels against per-row loop references.

Same pattern as TestVectorizedDriverKernels in test_crawl_pipeline.py: the
production kernels run one whole-batch vectorized pass; these references
re-derive the identical definition row by row, so a vectorization bug can't
hide behind "both sides share the code".
"""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from anansi_ray.functions.text import (
    _fold_bytes,
    fingerprint_batch,
    token_count_batch,
)
from anansi_ray.functions import text as ftext

_WS = re.compile(r"\s+")

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the  quick\tbrown\nfox",
    "",
    None,
    "ab",  # sub-k document
    "abcd",  # exactly k-1 bytes
    "abcde",  # exactly one gram, fewer than w grams
    "aaaaaaaaaaaaaaaaaaaa",  # constant text: all grams equal
    "Hello, world! 123 naïve café — dashes…",  # multi-byte UTF-8
    "word " * 50,
    "中文测试 some mixed 内容 here",
]


def _winnow_reference(text: str | None, k: int = 5, w: int = 8) -> str:
    """Per-row loop twin of fingerprint_batch's winnow path: hash every
    k-byte gram of the normalized UTF-8 bytes with the FNV fold +
    splitmix64 finalize, take the per-window minimum, unique, top 16."""
    norm = _WS.sub(" ", (text or "").strip()).lower().encode("utf-8")
    if len(norm) < k:
        sel = np.array([_fold_bytes(norm)], dtype=np.uint64)
    else:
        hs = np.array(
            [_fold_bytes(norm[i : i + k]) for i in range(len(norm) - k + 1)],
            dtype=np.uint64,
        )
        if len(hs) >= w:
            mins = [hs[i : i + w].min() for i in range(len(hs) - w + 1)]
            sel = np.unique(np.array(mins, dtype=np.uint64))
        else:
            sel = np.array([hs.min()], dtype=np.uint64)
    return "".join(f"{v:016x}" for v in sel[:16])


class TestFingerprintKernel:
    def test_winnow_matches_loop_reference(self):
        batch = pa.table(
            {"doc_id": list(range(len(TEXTS))), "text": pa.array(TEXTS, pa.string())}
        )
        out = fingerprint_batch(batch)
        got = out["fp_winnow"].to_pylist()
        exp = [_winnow_reference(t) for t in TEXTS]
        assert got == exp

    def test_md5_matches_hashlib(self):
        batch = pa.table(
            {"doc_id": list(range(len(TEXTS))), "text": pa.array(TEXTS, pa.string())}
        )
        out = fingerprint_batch(batch)
        for t, got in zip(TEXTS, out["fp_md5"].to_pylist()):
            norm = _WS.sub(" ", (t or "").strip()).lower()
            assert got == hashlib.md5(norm.encode()).hexdigest()

    def test_boundary_isolation(self):
        """A document's winnow must not depend on its batch neighbours —
        the concatenated-buffer pass must never read across a boundary."""
        solo = fingerprint_batch(
            pa.table({"doc_id": [0], "text": [TEXTS[0]]})
        )["fp_winnow"].to_pylist()[0]
        packed = fingerprint_batch(
            pa.table(
                {
                    "doc_id": [0, 1, 2],
                    "text": ["zzzz prefix text", TEXTS[0], "suffix zzzz"],
                }
            )
        )["fp_winnow"].to_pylist()[1]
        assert solo == packed


class TestTokenCountKernel:
    def test_bpe_count_matches_findall(self):
        pat = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")
        batch = pa.table(
            {"doc_id": list(range(len(TEXTS))), "text": pa.array(TEXTS, pa.string())}
        )
        out = token_count_batch(batch)
        got = out["n_tokens"].to_pylist()
        exp = [len(pat.findall(t)) if t else 0 for t in TEXTS]
        assert got == exp


class TestTfidfKernel:
    def test_scores_and_topk(self):
        batch = pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text": pa.array(["cat cat dog", "dog emu emu emu"], pa.string()),
            }
        )
        vocab = {"cat": 1, "dog": 2, "emu": 1}
        out = ftext.tfidf_score_batch(batch, vocab, n_docs=2, top_k=2)
        rows = {
            (r["doc_id"], r["token"]): (r["tf"], r["df"], r["score"])
            for r in out.to_pylist()
        }
        import math

        # doc 10: cat tf=2 df=1 -> 2*ln(2); dog tf=1 df=2 -> 0.0
        assert rows[(10, "cat")] == (2, 1, round(2 * math.log(2), 6))
        assert rows[(10, "dog")] == (1, 2, 0.0)
        # doc 11 top-2 by (score desc, token): emu 3*ln2, dog 0
        assert rows[(11, "emu")] == (3, 1, round(3 * math.log(2), 6))
        assert rows[(11, "dog")] == (1, 2, 0.0)
        assert len(rows) == 4

    def test_out_of_vocab_dropped(self):
        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["zz yy zz"], pa.string())}
        )
        out = ftext.tfidf_score_batch(batch, {"cat": 1}, n_docs=5)
        assert out.num_rows == 0
        assert out.schema.field("doc_id").type == pa.int64()


class TestShingles:
    def test_eight_token_windows(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["a b c d e f g h i", "one, two; THREE"], pa.string()
                ),
            }
        )
        doc_idx, sh = ftext.shingles_for_batch(batch, k=8)
        assert sh == ["a b c d e f g h", "b c d e f g h i"]
        assert doc_idx.tolist() == [0, 0]  # doc 2 has <8 tokens

    def test_punctuation_and_case_normalized(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["One, two! three-four FIVE six. seven? eight"], pa.string()),
            }
        )
        _, sh = ftext.shingles_for_batch(batch, k=8)
        assert sh == ["one two three four five six seven eight"]


class TestPiiRedact:
    def test_vs_row_loop(self):
        texts = [
            "mail a.b+c-d@x.co.uk and x@y.z now",
            "ips 10.0.0.1 and 192.168.255.254, not 1234.5.6.7 ok",
            "email-in-domain u@10.0.0.1ish.org then 8.8.8.8",
            "",
            None,
            "@not-an-email nor 1.2.3 nor a@b",
        ]
        b = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        out = ftext.pii_redact_batch(b).to_pylist()
        email = re.compile(r"[\w.+-]+@[\w-]+(\.[\w-]+)+")
        ip = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
        for row, t in zip(out, texts):
            t = t or ""
            s1, n_email = email.subn("<EMAIL>", t)
            clean, n_ip = ip.subn("<IP>", s1)
            assert row["clean_text"] == clean
            assert row["n_emails"] == n_email
            assert row["n_ips"] == n_ip

    def test_email_redacted_before_ip(self):
        # the address inside the email's host must not surface as an IP hit
        b = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": ["u@1.2.3.4 only"]}
        )
        row = ftext.pii_redact_batch(b).to_pylist()[0]
        assert row == {
            "doc_id": 0,
            "clean_text": "<EMAIL> only",
            "n_emails": 1,
            "n_ips": 0,
        }


class TestRepetition:
    def test_vs_row_loop(self):
        texts = [
            "a a a a",
            "a b c d",
            "The THE the. tHe!",  # case-folds + punct-splits to one token
            "",
            None,
            "x",
        ]
        b = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        out = ftext.repetition_batch(b).to_pylist()
        for row, t in zip(out, texts):
            toks = re.findall(r"\w+", (t or "").lower())
            assert row["n_tokens"] == len(toks)
            assert row["n_unique"] == len(set(toks))
            exp = 0.0 if not toks else 1.0 - len(set(toks)) / len(toks)
            assert abs(row["repetition"] - round(exp, 6)) < 1e-12


class TestNfcNormalize:
    def test_ascii_fast_path_returns_input(self):
        import pyarrow as pa
        from anansi_ray.functions.text import nfc_normalize_array

        a = pa.array(["plain", "ascii only", ""])
        out = nfc_normalize_array(a)
        assert out.to_pylist() == a.to_pylist()

    def test_composes_and_handles_nulls(self):
        import unicodedata
        import pyarrow as pa
        from anansi_ray.functions.text import nfc_normalize_array

        decomposed = "Cafe\u0301"
        a = pa.array([decomposed, None, "x", "étude"])
        out = nfc_normalize_array(a).to_pylist()
        assert out[0] == unicodedata.normalize("NFC", decomposed)
        assert len(out[0]) == 4
        assert out[1] is None
        assert out[2] == "x"
        assert len(out[3]) == 5
