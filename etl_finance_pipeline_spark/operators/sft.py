"""Instruction-tuning (SFT) data preparation: chat-template rendering,
token-level loss masking, and conversation-safe packing inputs.

A supervised-fine-tuning pipeline consumes *conversations*, not raw
documents: alternating user/assistant turns rendered through a chat
template, with a per-token loss mask that trains the model only on
assistant tokens (plus the end-of-turn terminator it must learn to
emit). This module derives a deterministic conversation from each
document — fixed-length alternating turns over the whitespace token
stream — and renders/masks it with PURE projection expressions:
``split`` → ``transform``/``slice``/``array_join`` over the token
array. No explode, no shuffle, no UDF — at 100 TB this is a narrow
whole-stage-codegen map over the corpus scan, the same plan shape as
``html_extract``.

Turn derivation (everything downstream is deterministic given text):

- tokens = whitespace-split of ``lower(trim(text))`` (the corpus-wide
  tokenization used by every other text operator);
- consecutive runs of ``TURN_TOKENS`` tokens become turns 0..t-1;
  even turn index → ``user``, odd → ``assistant`` (a conversation
  starts with the user);
- a trailing USER turn (complete or partial) is unanswered and is
  dropped; a trailing partial assistant turn is kept (short replies
  are valid);
- conversations with fewer than 2 surviving turns (no assistant turn
  to learn from) are dropped.

Rendered template per turn: ``<|role|> tok tok ... <|eot|>``, turns
joined with a newline. Stream tokens per turn = 1 role marker +
content tokens + 1 ``<|eot|>``. Loss mask: assistant content tokens
and the assistant ``<|eot|>`` are 1, everything else (user tokens,
both markers' positions, user ``<|eot|>``) is 0 — the standard
"train on completions only" masking.

SQL twins (DuckDB) live beside the queries in
``plans/training_data.py``; every expression here was chosen to have
an exact engine-portable counterpart (list slicing clamps at the end
in both engines; ``repeat``/``array_to_string`` match).

The reference pipeline (a single-node pandas finance ETL,
``/root/reference/src``) has no SFT surface; this module is part of
the engine's LLM-training charter, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Content tokens per conversation turn (fixed → deterministic turns).
TURN_TOKENS = 12

ROLE_USER = "user"
ROLE_ASSISTANT = "assistant"
EOT = "<|eot|>"


def _conversation_cols(text_col: str) -> dict[str, Column]:
    """The shared turn-geometry expressions. All integer arithmetic is
    kept in longs so the DuckDB twin (BIGINT) type-matches."""
    tl = TURN_TOKENS
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks).cast("long")
    # ceil(n / tl) without FP: (n + tl - 1) div tl — but exact double
    # division is also safe here and matches the SQL twin's floor()
    t_total = F.floor((n + tl - 1) / F.lit(float(tl))).cast("long")
    # drop a trailing user turn: user turns are even indices, so an
    # odd t_total ends on a user turn → keep an even count
    n_turns = (t_total - t_total % 2).cast("long")
    kept = F.when(n_turns == t_total, n).otherwise(n_turns * tl)
    return {
        "toks": toks,
        "n": n,
        "t_total": t_total,
        "n_turns": n_turns,
        "kept": kept,
    }


def sft_render(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Render each document as a deterministic multi-turn conversation.

    Output (one row per VALID conversation — ≥1 assistant turn):
    ``(id, *keep_cols, n_turns, n_user_tokens, n_assistant_tokens,
    n_stream_tokens, n_loss_tokens, rendered, loss_mask)`` where

    - ``rendered`` is the chat-template text
      (``<|user|> ... <|eot|>\\n<|assistant|> ... <|eot|>`` ...),
    - ``loss_mask`` is a 0/1 character string, one character per
      STREAM token (role marker + content + eot per turn), 1 exactly
      on assistant content tokens and the assistant ``<|eot|>``.

    Pure projection — zero shuffles, zero UDFs; the whole operator
    inlines into the scan's codegen stage.
    """
    tl = TURN_TOKENS
    g = _conversation_cols(text_col)
    toks, n, t_total, n_turns, kept = (
        g["toks"],
        g["n"],
        g["t_total"],
        g["n_turns"],
        g["kept"],
    )

    n_user = n_turns * (tl // 2)  # user turns are always full
    n_assist = kept - n_user
    # stream = per turn: marker + content + eot
    n_stream = kept + 2 * n_turns
    # loss = assistant content + assistant eot (n_turns/2 assistant turns)
    half_turns = F.floor(n_turns / F.lit(2.0)).cast("long")
    n_loss = n_assist + half_turns

    seq = F.sequence(F.lit(0).cast("long"), n_turns - 1)

    def role(i: Column) -> Column:
        return F.when(i % 2 == 0, F.lit(ROLE_USER)).otherwise(
            F.lit(ROLE_ASSISTANT)
        )

    def turn_len(i: Column) -> Column:
        # only the LAST kept turn can be partial, and only when no
        # trailing user turn was dropped (n_turns == t_total)
        return F.when(
            (i == n_turns - 1) & (n_turns == t_total), n - (n_turns - 1) * tl
        ).otherwise(F.lit(tl).cast("long"))

    rendered = F.array_join(
        F.transform(
            seq,
            lambda i: F.concat(
                F.lit("<|"),
                role(i),
                F.lit("|> "),
                F.array_join(F.slice(toks, (i * tl + 1).cast("int"), tl), " "),
                F.lit(" " + EOT),
            ),
        ),
        "\n",
    )
    mask = F.array_join(
        F.transform(
            seq,
            lambda i: F.when(
                i % 2 == 0,
                F.repeat(F.lit("0"), (turn_len(i) + 2).cast("int")),
            ).otherwise(
                F.concat(
                    F.lit("0"),
                    F.repeat(F.lit("1"), (turn_len(i) + 1).cast("int")),
                )
            ),
        ),
        "",
    )

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_turns.alias("n_turns"),
        n_user.alias("n_user_tokens"),
        n_assist.alias("n_assistant_tokens"),
        n_stream.alias("n_stream_tokens"),
        n_loss.alias("n_loss_tokens"),
        rendered.alias("rendered"),
        mask.alias("loss_mask"),
    ).filter(F.col("n_turns") >= 2)
