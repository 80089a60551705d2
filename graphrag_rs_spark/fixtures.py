"""Deterministic synthetic transcript fixtures.

Seeded generator for the pipeline's primary input table
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` (shape from BASELINE.json input_hint).

Entity/relation plants follow the reference's bench generator dictionaries
(graphrag-rs benches/graph_construction.rs:168-256): titled people, orgs
with suffixes, known locations, relation trigger phrases, plus near-duplicate
surface forms to exercise canonicalization. Per-conversation RNG is seeded
from (seed, conv index) so generation is deterministic and order/partition
independent — the same conv_id always gets the same turns, whether generated
on the driver or inside a distributed ``mapInPandas``.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

PEOPLE = [
    "Dr. John Smith", "John Smith", "Jon Smith", "Jhon Smith",
    "Alice Johnson", "Alice Johnsen",
    "Prof. Robert Brown", "Robert Brown", "Rupert Brown",
    "Mary Williamson", "Marry Williamson",
    "David Patterson", "Dave Patterson",
    "Sarah Henderson", "Captain James Crawford", "James Crawford",
    "Emma Thompson", "Laura Bennett", "Michael Anderson", "Mikael Anderson",
]

ORGS = [
    "Microsoft Corporation", "Acme Corp", "Globex Inc", "Initech LLC",
    "Stanford University", "University of Chicago", "Institute of Technology",
    "Wayne Group", "Stark Solutions", "Umbrella Technologies", "Hooli Ltd",
]

LOCATIONS = [
    "Seattle", "New York", "New York City", "California", "London", "Paris",
    "Tokyo", "Berlin", "Washington", "Boston", "Chicago", "United States",
]

RELATION_PHRASES = [
    "works for", "is employed by", "founded", "is the CEO of", "was born in",
    "comes from", "lives in", "is based in", "is headquartered in",
    "married", "is the spouse of", "is a colleague of", "partnered with",
    "met", "visited", "joined",
]

FILLER_SENTENCES = [
    "Could you summarize the earlier discussion for me please.",
    "That sounds reasonable, let us continue with the plan as agreed.",
    "I ran the analysis again and the results look consistent overall.",
    "Please double check the numbers before we publish the final report.",
    "The weather made travel difficult but everyone arrived on schedule.",
    "We should schedule a follow up meeting to review these conclusions.",
    "Here is the relevant excerpt from the archived project notes today.",
    "Understood, I will take care of the remaining items this afternoon.",
]

TOOLS = [None, None, None, "search", "calculator", "code_interpreter"]

_EPOCH = datetime(2026, 1, 1, 0, 0, 0)

# --------------------------------------------------------------------------
# Procedural scaled vocabulary (bench path).
#
# The fixed 43-name vocabulary above caps the graph at ~100 nodes no matter
# how many conversations are generated, so a bench run never exercises
# canonicalization/CC/materialization at non-toy graph sizes. ``ScaledVocab``
# derives entity names procedurally from an integer index — no pool is ever
# materialized, so a 100k-entity vocabulary costs nothing to ship to
# executors — with (a) Zipf-skewed index draws (hub entities) and (b)
# planted near-duplicate misspellings (canonicalization work), while
# keeping surface forms the pattern extractor recognizes (capitalized
# First Last pairs; org names with known suffixes, entity/mod.rs:485-549).
# --------------------------------------------------------------------------

# High-entropy syllable space (onset × vowel × coda ≈ 1,700 syllables):
# two-syllable words draw from ~3M combinations, so DISTINCT base
# identities are rarely accidentally similar — the near-duplicate load on
# the canonicalizer comes from the PLANTED typos below, as in real data,
# not from a low-entropy name generator colliding with itself.
_ONSETS = ("b br c ch cl d dr f fl g gr h j k kl l m n p pr qu r s sh sk "
           "st t th tr v w y z").split()
_VOWELS = "a e i o u ai ei ou".split()
_CODAS = "b d g k l m n r s t x nd rn st".split()

_ORG_SUFFIXES = ("Corporation", "Corp", "Inc", "LLC", "Ltd", "Group",
                 "Solutions", "Technologies")


def _syllable(idx: int) -> str:
    idx, o = divmod(idx, len(_ONSETS))
    idx, v = divmod(idx, len(_VOWELS))
    _, c = divmod(idx, len(_CODAS))
    return _ONSETS[o] + _VOWELS[v] + _CODAS[c]


_N_SYL = len(_ONSETS) * len(_VOWELS) * len(_CODAS)


def _word(idx: int, n_syllables: int) -> str:
    parts = []
    # golden-ratio hash spreads consecutive indexes across the syllable
    # space so idx and idx+1 produce unrelated names
    h = (idx * 2654435761) & 0xFFFFFFFF
    for _ in range(n_syllables):
        h, r = divmod(h, _N_SYL)
        parts.append(_syllable(r))
    return "".join(parts).capitalize()


def person_name(idx: int) -> str:
    """Deterministic 'First Last' — both words capitalized multi-syllable,
    which phase 3 of the reference extractor recognizes
    (entity/mod.rs:443-482)."""
    return f"{_word(idx * 2 + 1, 2)} {_word(idx * 3 + 7, 3)}"


def org_name(idx: int) -> str:
    """Deterministic org with a recognized suffix (entity/mod.rs:485-523)."""
    return f"{_word(idx * 5 + 3, 3)} {_ORG_SUFFIXES[idx % len(_ORG_SUFFIXES)]}"


def _typo(name: str, rng: random.Random) -> str:
    """Near-duplicate surface form: one letter dropped, doubled, or swapped
    inside a word (never the capitalized first letter, so extraction still
    fires); keeps edit distance ≤ 2 of the original — linkable."""
    words = name.split(" ")
    wi = rng.randrange(len(words))
    w = words[wi]
    if len(w) < 4:
        return name
    pos = rng.randrange(1, len(w) - 1)
    kind = rng.randrange(3)
    if kind == 0:
        w = w[:pos] + w[pos + 1:]
    elif kind == 1:
        w = w[:pos] + w[pos] + w[pos:]
    else:
        w = w[:pos] + w[pos + 1] + w[pos] + w[pos + 2:]
    words[wi] = w
    return " ".join(words)


class ScaledVocab:
    """Entity-name source scaling with corpus size.

    ``n_persons`` / ``n_orgs`` bound the distinct base identities; draws
    are Zipf-ish skewed (``rng.random()**skew_pow`` → low indexes are hubs)
    and ``near_dup_rate`` of mentions surface as misspelled variants.

    Each identity has a BOUNDED pool of ``n_variants`` deterministic
    misspellings (variant slot → seeded typo), mirroring real data where an
    entity's distinct surface forms are a small set. An earlier version drew
    a fresh random typo per occurrence, which made every Zipf hub sprout
    hundreds of distinct one-off variants — a C(v,2) match-pair clique per
    hub family that inflated the canonicalizer's pair/CC stages ~30× with
    work no real corpus would generate."""

    def __init__(self, n_persons: int, n_orgs: int, skew_pow: float = 3.0,
                 near_dup_rate: float = 0.15, n_variants: int = 4,
                 hub_rate: float = 0.0):
        self.n_persons = max(1, n_persons)
        self.n_orgs = max(1, n_orgs)
        self.skew_pow = skew_pow
        self.near_dup_rate = near_dup_rate
        self.n_variants = max(1, n_variants)
        # SURVEY §7.4 hard part 3 stress knob: probability that a draw
        # short-circuits to identity 0 regardless of the Zipf tail —
        # hub_rate=0.1 plants a single entity carrying ~10% of ALL
        # mentions (the Zipf skew alone tops out around 3%)
        self.hub_rate = hub_rate

    def _draw(self, rng: random.Random, n: int) -> int:
        if self.hub_rate and rng.random() < self.hub_rate:
            return 0
        return int(n * (rng.random() ** self.skew_pow))

    def _variant(self, name: str, idx: int, rng: random.Random) -> str:
        # deterministic per (identity, slot): hubs repeat the same few
        # misspellings instead of inventing a new one per occurrence
        slot = rng.randrange(self.n_variants)
        return _typo(name, random.Random((idx * 1_000_003) ^ (slot * 7_919)))

    def person(self, rng: random.Random) -> str:
        idx = self._draw(rng, self.n_persons)
        name = person_name(idx)
        if rng.random() < self.near_dup_rate:
            name = self._variant(name, idx, rng)
        return name

    def org(self, rng: random.Random) -> str:
        idx = self._draw(rng, self.n_orgs)
        name = org_name(idx)
        if rng.random() < self.near_dup_rate:
            name = self._variant(name, idx, rng)
        return name


def _turn_text(rng: random.Random, vocab: ScaledVocab | None = None) -> str:
    """One turn: 1-3 sentences, ~40% carrying an entity/relation plant."""

    def pick_person() -> str:
        return vocab.person(rng) if vocab else rng.choice(PEOPLE)

    def pick_org() -> str:
        return vocab.org(rng) if vocab else rng.choice(ORGS)

    sentences = []
    for _ in range(rng.randint(1, 3)):
        roll = rng.random()
        if roll < 0.18:
            p = pick_person()
            o = pick_org()
            rel = rng.choice(RELATION_PHRASES[:4])
            sentences.append(f"{p} {rel} {o}.")
        elif roll < 0.30:
            p = pick_person()
            loc = rng.choice(LOCATIONS)
            rel = rng.choice(RELATION_PHRASES[4:8])
            sentences.append(f"{p} {rel} {loc}.")
        elif roll < 0.38:
            if vocab:
                p1, p2 = vocab.person(rng), vocab.person(rng)
            else:
                p1, p2 = rng.sample(PEOPLE, 2)
            rel = rng.choice(RELATION_PHRASES[9:13])
            sentences.append(f"{p1} {rel} {p2}.")
        elif roll < 0.44:
            o = pick_org()
            loc = rng.choice(LOCATIONS)
            sentences.append(f"{o} is headquartered in {loc}.")
        else:
            sentences.append(rng.choice(FILLER_SENTENCES))
    return " ".join(sentences)


def generate_conversation(conv_index: int, seed: int = 42, mega_every: int = 50,
                          mega_turns: int = 200,
                          vocab: ScaledVocab | None = None,
                          extreme_skew: bool = False) -> list[dict]:
    """All turns of one conversation — deterministic in (seed, conv_index).

    Every ``mega_every``-th conversation is a "mega conversation" with
    ``mega_turns`` turns (Zipf-ish skew per FIXTURES.md §1) to exercise the
    skew handling paths. ``vocab`` switches entity plants from the fixed
    43-name dictionary to the procedural scaled vocabulary (bench path).
    ``extreme_skew`` additionally turns every 2500th conversation into a
    1,150-turn giant — 100× the ~11.5-turn median, the SURVEY §7.4 hard
    part 3 stress shape (pair with ``ScaledVocab(hub_rate=0.1)`` for the
    10%-frequency hub entity).
    """
    rng = random.Random((seed << 20) ^ conv_index)
    conv_id = f"conv{conv_index:08d}"
    if extreme_skew and conv_index % 2500 == 0:
        n_turns = 1150
    elif mega_every and conv_index % mega_every == 0:
        n_turns = mega_turns
    else:
        n_turns = rng.randint(3, 20)
    base_ts = _EPOCH + timedelta(hours=conv_index % 10_000)
    rows = []
    for t in range(n_turns):
        role = "user" if t % 2 == 0 else "assistant"
        tool = rng.choice(TOOLS)
        if tool is not None and role == "assistant":
            role = "tool"
        else:
            tool = None
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _turn_text(rng, vocab),
                "tool": tool,
                "ts": base_ts + timedelta(seconds=30 * t),
            }
        )
    return rows


def generate_transcripts(n_conversations: int, seed: int = 42, **kw) -> list[dict]:
    rows = []
    for i in range(n_conversations):
        rows.extend(generate_conversation(i, seed=seed, **kw))
    return rows


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(spark, n_conversations: int, seed: int = 42, *,
                   distributed: bool = False, partitions: int | None = None, **kw):
    """Build the transcripts DataFrame.

    ``distributed=True`` generates inside executors via ``mapInPandas`` over
    ``spark.range`` (one row per conversation) — the generator never funnels
    through the driver, so bench-scale inputs stay distributed.
    """
    if not distributed:
        return spark.createDataFrame(generate_transcripts(n_conversations, seed=seed, **kw),
                                     schema=TRANSCRIPT_SCHEMA)

    import pandas as pd  # local import: executors re-import this module

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_index in pdf["id"]:
                out.extend(generate_conversation(int(conv_index), seed=seed, **kw))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    rng_df = spark.range(n_conversations)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
