"""Custom stateful streaming operator: session-gated document assembly
via ``applyInPandasWithState``.

``stream.py`` gates conversation completeness with a warehouse-backed
pending buffer inside ``foreachBatch`` (state survives restarts in the
warehouse). This module is the state-store-native alternative: turns
buffer in the Spark state store per ``conv_id``, and a conversation is
emitted as an assembled document when its **event-time timeout** fires —
i.e. the watermark has passed ``max(ts) + gap_seconds``, the same
"quiet for N seconds" session semantics, but expressed with
``GroupState`` + ``EventTimeTimeout`` instead of a buffer table.

Output parity: the emitted ``(conv_id, doc_hid, doc_iri, n_turns,
text)`` row is byte-identical to the batch
:func:`~ontocast_spark.operators.assemble.assemble_documents` — same
``turn_idx`` ordering, same separator, same ``sha256(text)[:12]`` hid —
so the stateful stream can feed the identical downstream pipeline
(tests assert equality against the batch operator).

Scale notes:

- State per conversation is the buffered turn list — bounded by the
  same ``max_turns`` skew cap as the batch path (applied on ingest,
  before the state write, so an adversarial conversation cannot grow
  the state store).
- The state store shuffles by ``conv_id`` exactly once per micro-batch
  (the ``groupby``); no global windows.
- Turns older than the watermark are dropped by Spark before they
  reach the operator (verified empirically: a straggler behind an
  already-advanced watermark never re-opens the session). A straggler
  that is late for its session but still within the watermark starts a
  NEW state entry and emits a second document; the downstream kg_canon
  resume key anti-joins that re-emission away — the same
  at-least-once -> exactly-once contract as the foreachBatch path.
- State survives query restarts via the stream checkpoint (verified:
  stop/start mid-session, the buffered turns resume and the final
  document contains turns from both sides of the restart).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from ..operators.assemble import TURN_SEPARATOR

DOC_SCHEMA = (
    "conv_id string, doc_hid string, doc_iri string, n_turns bigint, text string"
)
STATE_SCHEMA = "turn_idx array<int>, texts array<string>, max_ts_ms bigint"


def _assemble(conv_id: str, idxs: list, texts: list, domain: str,
              separator: str) -> pd.DataFrame:
    # tie-break duplicate turn_idx by text, replicating the batch
    # operator's array_sort(struct(turn_idx, text)) — a stable sort on
    # turn_idx alone would keep arrival order and diverge from the
    # batch doc_hid on duplicate-index input
    order = sorted(range(len(idxs)), key=lambda i: (idxs[i], texts[i]))
    text = separator.join(texts[i] for i in order)
    hid = hashlib.sha256(text.encode("utf-8")).hexdigest()[:12]
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "doc_hid": [hid],
            "doc_iri": [f"{domain}/doc/{hid}"],
            "n_turns": [len(idxs)],
            "text": [text],
        }
    )


def assemble_sessions_stateful(
    turns,
    gap_seconds: int = 300,
    domain: str = "https://example.com",
    separator: str = TURN_SEPARATOR,
    max_turns: int | None = None,
):
    """Streaming turns(conv_id, turn_idx, role, text, tool, ts) —
    watermarked on ``ts`` — to streaming assembled documents.

    A conversation's turns accumulate in ``GroupState``; when the
    watermark passes ``max(ts) + gap_seconds`` the event-time timeout
    fires, the document is assembled and emitted, and the state is
    cleared."""
    gap_ms = gap_seconds * 1000

    def gate(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            idxs, texts, _ = state.get
            state.remove()
            yield _assemble(conv_id, list(idxs), list(texts), domain, separator)
            return
        idxs: list[int] = []
        texts: list[str] = []
        max_ts_ms = 0
        if state.exists:
            old_idx, old_txt, old_ts = state.get
            idxs, texts, max_ts_ms = list(old_idx), list(old_txt), int(old_ts)
        for pdf in pdfs:
            if max_turns is not None:
                pdf = pdf[pdf["turn_idx"] < max_turns]
            if len(pdf) == 0:
                continue
            idxs.extend(int(v) for v in pdf["turn_idx"])
            texts.extend("" if v is None else str(v) for v in pdf["text"])
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                max_ts_ms = max(max_ts_ms, int(batch_max.value // 1_000_000))
        if not idxs:
            return
        state.update((idxs, texts, max_ts_ms))
        # clamp: when several file drops collapse into one micro-batch
        # the watermark can already sit past max(ts)+gap for an older
        # session; Spark rejects a timeout at/behind the watermark, so
        # fire at the earliest legal instant instead (the session is
        # overdue either way — same document, next trigger)
        timeout_ms = max_ts_ms + gap_ms
        wm_ms = state.getCurrentWatermarkMs()
        if timeout_ms <= wm_ms:
            timeout_ms = wm_ms + 1
        state.setTimeoutTimestamp(timeout_ms)
        return

    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            gate,
            outputStructType=DOC_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
