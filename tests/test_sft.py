"""SFT data-prep tests: chat-template rendering, loss masking,
preference-pair construction, and epoch scheduling — each checked
against an independent pure-Python reference on hand-built inputs,
plus plan-shape assertions (render must stay a zero-shuffle
projection)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.sft import (
    EOT,
    TURN_TOKENS,
    sft_render,
)


# ---------------------------------------------------------------
# Pure-Python reference (independent re-derivation of the spec)
# ---------------------------------------------------------------

def ref_conversation(text: str):
    """Reference render+mask: returns None for invalid conversations,
    else a dict with all the operator's outputs."""
    toks = text.strip().lower().split()
    n = len(toks)
    if n == 0:
        toks, n = [""], 1  # split('\\s+') on empty yields ['']
    t_total = math.ceil(n / TURN_TOKENS)
    n_turns = t_total - (t_total % 2)
    if n_turns < 2:
        return None
    kept = n if n_turns == t_total else n_turns * TURN_TOKENS
    blocks, mask_parts = [], []
    for i in range(n_turns):
        chunk = toks[i * TURN_TOKENS : (i + 1) * TURN_TOKENS]
        role = "user" if i % 2 == 0 else "assistant"
        blocks.append(f"<|{role}|> " + " ".join(chunk) + f" {EOT}")
        if role == "user":
            mask_parts.append("0" * (len(chunk) + 2))
        else:
            mask_parts.append("0" + "1" * (len(chunk) + 1))
    n_user = (n_turns // 2) * TURN_TOKENS
    return {
        "n_turns": n_turns,
        "n_user_tokens": n_user,
        "n_assistant_tokens": kept - n_user,
        "n_stream_tokens": kept + 2 * n_turns,
        "n_loss_tokens": (kept - n_user) + n_turns // 2,
        "rendered": "\n".join(blocks),
        "loss_mask": "".join(mask_parts),
    }


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _text(n):
    return " ".join(WORDS[i % len(WORDS)] for i in range(n))


class TestSftRender:
    @pytest.mark.parametrize(
        "n_tok",
        [0, 1, 11, 12, 13, 23, 24, 25, 35, 36, 37, 48, 100, 144, 145],
    )
    def test_matches_reference(self, spark, n_tok):
        texts = [_text(n_tok)]
        out = sft_render(_mkdocs(spark, texts)).collect()
        ref = ref_conversation(texts[0])
        if ref is None:
            assert out == []
            return
        assert len(out) == 1
        row = out[0].asDict()
        for k, v in ref.items():
            assert row[k] == v, (k, n_tok)

    def test_mask_length_equals_stream_tokens(self, spark):
        texts = [_text(n) for n in (24, 30, 36, 50, 77, 120)]
        for row in sft_render(_mkdocs(spark, texts)).collect():
            assert len(row["loss_mask"]) == row["n_stream_tokens"]
            assert row["loss_mask"].count("1") == row["n_loss_tokens"]

    def test_trailing_user_turn_dropped(self, spark):
        # 25 tokens → turns of 12/12/1; the 1-token turn is user → drop
        [row] = sft_render(_mkdocs(spark, [_text(25)])).collect()
        assert row["n_turns"] == 2
        assert row["n_assistant_tokens"] == 12
        # 35 tokens → 12/12/11, trailing turn is assistant → kept
        [row] = sft_render(_mkdocs(spark, [_text(35)])).collect()
        assert row["n_turns"] == 2  # wait: 35 → t_total=3 (odd) → 2
        assert row["n_assistant_tokens"] == 12

    def test_partial_assistant_turn_kept(self, spark):
        # 40 tokens → t_total=4 turns 12/12/12/4; turn 3 assistant short
        [row] = sft_render(_mkdocs(spark, [_text(40)])).collect()
        assert row["n_turns"] == 4
        assert row["n_assistant_tokens"] == 12 + 4
        assert row["rendered"].endswith(EOT)

    def test_roles_alternate_starting_user(self, spark):
        [row] = sft_render(_mkdocs(spark, [_text(48)])).collect()
        lines = row["rendered"].split("\n")
        assert [ln.split(" ")[0] for ln in lines] == [
            "<|user|>",
            "<|assistant|>",
            "<|user|>",
            "<|assistant|>",
        ]

    def test_plan_is_shuffle_free(self, spark):
        plan = sft_render(
            _mkdocs(spark, [_text(30)])
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPrefPairs:
    def test_pairing_invariants(self, spark, tmp_path):
        # build a small documents parquet so the query can load it
        import random

        rng = random.Random(7)
        rows = []
        for i in range(60):
            n = rng.randint(5, 120)
            text = " ".join(
                "the quick brown fox jumps".split()[j % 5] for j in range(n)
            )
            if i % 3 == 0:
                text = text.replace("the", "zz9##")  # degrade quality
            rows.append((i, text, "en", f"src{i % 2}", len(text)))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        from etl_finance_pipeline_spark.plans.training_data import (
            _pref_pair_frame,
        )

        pairs = _pref_pair_frame(spark, str(tmp_path)).collect()
        assert pairs, "expected at least one preference pair"
        seen_chosen, seen_rejected = set(), set()
        for p in pairs:
            assert p["margin"] > 0.1
            assert p["chosen_id"] != p["rejected_id"]
            key_c = (p["source"], p["chosen_id"])
            key_r = (p["source"], p["rejected_id"])
            assert key_c not in seen_chosen  # each doc chosen at most once
            assert key_r not in seen_rejected
            seen_chosen.add(key_c)
            seen_rejected.add(key_r)
        # a document may not be on both sides of the SAME pair, and the
        # best-vs-worst construction keeps sides disjoint per source
        assert not (seen_chosen & seen_rejected)


class TestEpochSchedule:
    def test_formula_against_python(self, spark):
        from etl_finance_pipeline_spark.plans.training_data import (
            _EPOCH_BUDGET_X,
            _EPOCH_RD,
            q_epoch_schedule,
        )

        out = {
            r["source"]: r.asDict()
            for r in q_epoch_schedule(spark, "/root/testdata/sf0.001").collect()
        }
        total = sum(v["unique_tokens"] for v in out.values())
        k = len(out)
        for src, v in out.items():
            w = (v["unique_tokens"] / total + 1.0 / k) / 2.0
            requested = _EPOCH_BUDGET_X * total * w
            epochs = requested / v["unique_tokens"]
            effective = (
                v["unique_tokens"]
                * _EPOCH_RD
                * (1.0 - math.exp(-epochs / _EPOCH_RD))
            )
            assert v["weight"] == pytest.approx(w, abs=1e-6)
            assert v["epochs"] == pytest.approx(epochs, abs=1e-6)
            assert v["effective_tokens"] == pytest.approx(effective, rel=1e-9)
            assert 0.0 < v["utilization"] <= 1.0

    def test_weights_sum_to_one(self, spark):
        from etl_finance_pipeline_spark.plans.training_data import (
            q_epoch_schedule,
        )

        rows = q_epoch_schedule(spark, "/root/testdata/sf0.001").collect()
        assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)


class TestLshTradeoff:
    def test_monotone_recall_in_bands(self, spark):
        from etl_finance_pipeline_spark.plans.training_data import (
            q_lsh_tradeoff,
        )

        rows = {
            r["bands"]: r.asDict()
            for r in q_lsh_tradeoff(spark, "/root/testdata/sf0.001").collect()
        }
        assert set(rows) == {2, 4, 8}
        # more bands → candidate set is a superset → recall and n_cand
        # monotone nondecreasing
        assert rows[2]["n_cand"] <= rows[4]["n_cand"] <= rows[8]["n_cand"]
        assert (rows[2]["recall"] or 0) <= (rows[4]["recall"] or 0) <= (
            rows[8]["recall"] or 0
        )
        for v in rows.values():
            assert v["n_hit"] <= v["n_cand"]
            assert v["n_hit"] <= v["n_truth"]
            assert 0.0 <= v["theoretical_pair_prob"] <= 1.0


class TestSftPack:
    def test_no_conversation_split_and_capacity(self, spark):
        from etl_finance_pipeline_spark.operators.corpus import pack_bins

        convs = sft_render(
            _mkdocs(spark, [_text(n) for n in range(24, 400, 7)])
        ).select("doc_id", "n_stream_tokens")
        packed = pack_bins(
            convs, tokens_col="n_stream_tokens", seq_tokens=128, num_shards=2
        ).collect()
        by_bin: dict = {}
        for r in packed:
            by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
        for (shard, bin_id), members in by_bin.items():
            fill = sum(m["n_tokens"] for m in members)
            assert all(m["bin_fill"] == fill for m in members)
            if len(members) > 1:
                assert fill <= 128  # multi-member bins never overflow
        # every conversation appears exactly once (no splitting)
        ids = [m["doc_id"] for ms in by_bin.values() for m in ms]
        assert len(ids) == len(set(ids)) == convs.count()
