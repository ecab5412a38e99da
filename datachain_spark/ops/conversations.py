"""Conversation / instruction-data preparation: turn flattening,
prompt-response pair extraction, structure validation and chat-template
rendering over a ``messages`` column (``array<struct<role, content>>`` —
the ShareGPT/OpenAI-messages shape instruction datasets ship in).

Spark-first shape: everything here is per-row array algebra (posexplode
or higher-order functions) — zero shuffles, zero Python, so a 100-TB
conversation dump processes as a pure scan. No reference counterpart
(spec addition: the reference stops at generic JSON explode; these are
the ops an SFT data pipeline actually runs between ingest and packing).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "flatten_turns", "extract_pairs", "conversation_stats", "render_chat",
]


def _msgs(messages_col: str) -> Column:
    return F.col(messages_col)


def flatten_turns(
    df: DataFrame,
    id_col: str,
    messages_col: str = "messages",
) -> DataFrame:
    """One row per turn: (id, turn, role, content). ``turn`` is the
    0-based position (posexplode — order preserved); NULL/empty message
    arrays yield no rows."""
    return df.select(
        F.col(id_col),
        F.posexplode(_msgs(messages_col)).alias("turn", "__m"),
    ).select(
        id_col, "turn",
        F.col("__m.role").alias("role"),
        F.col("__m.content").alias("content"),
    )


def extract_pairs(
    df: DataFrame,
    id_col: str,
    messages_col: str = "messages",
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Adjacent (user -> assistant) training pairs: one row per
    consecutive user/assistant message pair, (id, pair, prompt,
    response) with ``pair`` numbering pairs 0.. within the conversation.
    Non-adjacent or out-of-order turns (system prompts, double-user
    turns) simply don't pair — use :func:`conversation_stats` to audit
    them. Pure higher-order-function filtering over the array; the
    explode emits only the pairs."""
    m = _msgs(messages_col)
    # guard: sequence(0, -1) would count DOWN for sub-2-turn conversations
    idxs = F.when(F.size(m) >= 2, F.filter(
        F.sequence(F.lit(0), F.size(m) - 2),
        lambda i: (F.element_at(m, i + 1)["role"] == user_role)
        & (F.element_at(m, i + 2)["role"] == assistant_role),
    )).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idxs,
        lambda i: F.struct(
            F.element_at(m, i + 1)["content"].alias("prompt"),
            F.element_at(m, i + 2)["content"].alias("response"),
        ),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(pairs).alias("pair", "__p"),
    )
    return out.select(
        id_col, "pair",
        F.col("__p.prompt").alias("prompt"),
        F.col("__p.response").alias("response"),
    )


def conversation_stats(
    df: DataFrame,
    id_col: str,
    messages_col: str = "messages",
    user_role: str = "user",
    assistant_role: str = "assistant",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-conversation structure audit: turn counts by role, total
    content chars, and the two gate signals SFT pipelines filter on —
    ``n_role_repeats`` (adjacent same-role turns; >0 means broken
    alternation) and ``starts_with_user``. NULL arrays report zeros.
    One projection, zero shuffles. ``keep_cols`` passes extra columns
    through (e.g. the messages column itself, so an audit-gate ->
    extract_pairs pipeline stays one join-free plan)."""
    m = F.coalesce(
        _msgs(messages_col),
        F.array().cast(df.schema[messages_col].dataType.simpleString()),
    )
    roles = F.transform(m, lambda x: x["role"])
    n_role = lambda r: F.size(F.filter(roles, lambda x: x == r))  # noqa: E731
    repeats = F.size(
        F.filter(
            F.sequence(F.lit(0), F.greatest(F.size(m) - 2, F.lit(-1))),
            lambda i: F.element_at(roles, i + 1) == F.element_at(roles, i + 2),
        )
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        F.size(m).alias("n_turns"),
        n_role(user_role).cast("int").alias("n_user"),
        n_role(assistant_role).cast("int").alias("n_assistant"),
        F.aggregate(
            m, F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(F.length(x["content"]), F.lit(0)),
        ).alias("n_chars"),
        F.when(F.size(m) >= 2, repeats).otherwise(F.lit(0)).cast("int")
        .alias("n_role_repeats"),
        # try_element_at: ANSI element_at throws on the empty array
        (F.coalesce(F.try_element_at(roles, F.lit(1)) == user_role, F.lit(False)))
        .alias("starts_with_user"),
    )


def render_chat(
    df: DataFrame,
    id_col: str,
    messages_col: str = "messages",
    turn_template: str = "<|{role}|>{content}",
    separator: str = "\n",
    out_col: str = "text",
) -> DataFrame:
    """Render each conversation to ONE training string: every turn through
    ``turn_template`` (``{role}``/``{content}`` placeholders), joined by
    ``separator`` — the chat-template step before token counting /
    packing. NULL contents render as empty. Keeps all other columns."""
    if "{role}" not in turn_template or "{content}" not in turn_template:
        raise ValueError(
            "render_chat: turn_template needs {role} and {content}"
        )
    import re

    # tokenize so the placeholders may appear in EITHER order (and more
    # than once); literal segments stay literal
    tokens = [
        t for t in re.split(r"(\{role\}|\{content\})", turn_template) if t
    ]

    def render(x):
        parts = []
        for t in tokens:
            if t == "{role}":
                parts.append(F.coalesce(x["role"], F.lit("")))
            elif t == "{content}":
                parts.append(F.coalesce(x["content"], F.lit("")))
            else:
                parts.append(F.lit(t))
        return F.concat(*parts)

    rendered = F.transform(_msgs(messages_col), render)
    return df.withColumn(out_col, F.array_join(rendered, separator))
