"""Deterministic synthetic transcript corpus (no wall-clock, no external
data).

Generates the ``conversations(conv_id, turn_idx, role, text, tool, ts)``
table of BASELINE.json's ``input_hint`` with planted entities and
relations so expected triples are computable:

- person names with label variants ("John Doe" / "John D." / "J. Doe")
  to exercise fuzzy entity merging;
- organization names ("ACME Corporation" / "ACME Corp");
- finance-domain and crime-domain conversations (ontology selection);
- revenue figures and dates (typed literals);
- a configurable fraction of mega-conversations (skew path);
- some turns whose sentences mention disjoint entity groups, producing
  disconnected chunk graphs (hub auto-connect path).

Generation is per-conversation deterministic: ``gen_conversation`` is a
pure function of ``(conv_id, seed)``, so the Spark generator
(``synth_conversations``) can fan conv_ids out over any partitioning and
always produce the same corpus. Timestamps derive from the conv/turn
index, never the wall clock (resume safety).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

FIRST = ["John", "Jane", "Robert", "Alice", "Charlie", "Diana", "Susan", "Mary",
         "Victor", "Elena", "Marco", "Nina", "Oscar", "Paula", "Quentin", "Rita"]
LAST = ["Doe", "Smith", "Johnson", "Wilson", "Brown", "Prince", "Bell", "Clark",
        "Nakamura", "Fischer", "Laurent", "Okafor", "Petrov", "Garcia"]
ORG_A = ["ACME", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli",
         "Vandelay", "Wonka", "Tyrell", "Cyberdyne", "Nakatomi"]
ORG_B = ["Corporation", "Corp", "Industries", "Holdings", "Group", "Partners"]
COURTS = ["District Court", "Superior Court", "Appeals Court", "County Court"]
OFFENCES = ["Fraud", "Embezzlement", "Larceny", "Forgery", "Bribery"]

EPOCH = datetime(2024, 1, 1)


def _person(rng: random.Random) -> tuple[str, list[str]]:
    f, ln = rng.choice(FIRST), rng.choice(LAST)
    full = f"{f} {ln}"
    variants = [full, f"{f} {ln[0]}.", f"{f[0]}. {ln}"]
    return full, variants

def _org(rng: random.Random) -> tuple[str, list[str]]:
    a, b = rng.choice(ORG_A), rng.choice(ORG_B)
    full = f"{a} {b}"
    return full, [full, f"{a} Corp" if b != "Corp" else f"{a} Corporation", a]


def _fin_sentences(rng: random.Random) -> list[str]:
    p1, p1v = _person(rng)
    p2, _ = _person(rng)
    o1, o1v = _org(rng)
    o2, _ = _org(rng)
    rev = round(rng.uniform(1, 500), 2)
    day = EPOCH + timedelta(days=rng.randint(0, 364))
    pool = [
        f"{rng.choice(p1v)} works at {o1}.",
        f"{o1} reported revenue of ${rev} million for the quarter.",
        f"{rng.choice(o1v)} acquired {o2} last year.",
        f"{p2} is the CEO of {rng.choice(o1v)}.",
        f"{rng.choice(p1v)} holds shares of {o2}.",
        f"{o1} employs {p2} as an analyst covering the security market.",
        f"The report was filed on {day.date().isoformat()} with the regulator.",
        f"{o2} invests in {rng.choice(o1v)} through its holdings arm.",
        f"Revenue at {o1} grew 12.5 % while the market stayed flat.",
        f"{p1} met {p2} to discuss the organization's quarterly report.",
    ]
    rng.shuffle(pool)
    return pool


def _crm_sentences(rng: random.Random) -> list[str]:
    s1, s1v = _person(rng)
    w1, _ = _person(rng)
    off = rng.choice(OFFENCES)
    court = rng.choice(COURTS)
    day = EPOCH + timedelta(days=rng.randint(0, 364))
    pool = [
        f"{rng.choice(s1v)} was charged with {off} by the prosecutor.",
        f"The suspect {s1} was tried at the {court}.",
        f"{w1} testified against {rng.choice(s1v)} during the hearing.",
        f"{s1} was convicted of {off} on the evidence presented.",
        f"The offender was sentenced on {day.date().isoformat()} by the court.",
        f"New evidence links {rng.choice(s1v)} to the {off} case.",
        f"The victim identified {s1} before the {court}.",
    ]
    rng.shuffle(pool)
    return pool


def _chatter(rng: random.Random) -> str:
    return rng.choice([
        "Sure, let me look into that.",
        "Here is what I found so far.",
        "Can you summarize the key points?",
        "That matches the earlier filing.",
        "Understood, continuing with the analysis.",
        "Let me pull the relevant records.",
    ])


def gen_conversation(
    conv_idx: int,
    seed: int = 42,
    mega_every: int = 200,
    mega_turns: int = 400,
) -> list[tuple]:
    """Rows ``(conv_id, turn_idx, role, text, tool, ts)`` for one
    conversation. Pure function of (conv_idx, seed)."""
    rng = random.Random((seed << 32) ^ conv_idx)
    conv_id = f"conv{conv_idx:08d}"
    is_mega = mega_every > 0 and conv_idx % mega_every == mega_every - 1
    n_turns = mega_turns if is_mega else rng.randint(3, 12)
    domain_fin = (conv_idx % 3) != 2  # 2/3 finance, 1/3 crime
    rows = []
    sent_pool: list[str] = []
    for turn_idx in range(n_turns):
        if not sent_pool:
            sent_pool = _fin_sentences(rng) if domain_fin else _crm_sentences(rng)
        role = ("user", "assistant", "tool")[
            0 if turn_idx % 2 == 0 else (2 if rng.random() < 0.15 else 1)
        ]
        n_sent = rng.randint(1, 3)
        sentences = []
        for _ in range(n_sent):
            if rng.random() < 0.25:
                sentences.append(_chatter(rng))
            else:
                if not sent_pool:
                    sent_pool = (
                        _fin_sentences(rng) if domain_fin else _crm_sentences(rng)
                    )
                sentences.append(sent_pool.pop())
        text = " ".join(sentences)
        tool = "search" if role == "tool" else None
        ts = EPOCH + timedelta(minutes=conv_idx % 100000, seconds=17 * turn_idx)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    return rows


def gen_corpus(n_convs: int, seed: int = 42, **kw) -> list[tuple]:
    """Driver-side corpus for tests (small n only)."""
    rows: list[tuple] = []
    for i in range(n_convs):
        rows.extend(gen_conversation(i, seed=seed, **kw))
    return rows
