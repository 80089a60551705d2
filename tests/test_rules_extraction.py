"""Ports of graphrag-rs extractor test vectors (entity/mod.rs:1089-1133,
benches/graph_construction.rs:71-74)."""

from graphrag_rs_spark.rules.extraction import (
    calculate_confidence,
    clean_word,
    entity_id_for,
    extract_entities,
    extract_relationships,
    find_mentions,
    infer_relationship_type,
    normalize_name,
)


def _names(entities, etype=None):
    return [e.name for e in entities if etype is None or e.entity_type == etype]


def test_person_extraction():  # mod.rs:1094-1115
    text = "Entity Name works at Test Corp. Dr. Second Entity is a professor."
    entities = extract_entities(text)
    assert entities
    persons = [e for e in entities if e.entity_type == "PERSON"]
    assert persons
    assert "Entity Name" in _names(persons)


def test_relationship_extraction():  # mod.rs:1117-1132
    text = "Entity Name works for Test Corp in Test City."
    entities = extract_entities(text)
    triples = extract_relationships(entities, text)
    assert triples


def test_bench_sentence_dr_john_smith():  # benches/graph_construction.rs:71
    text = "Dr. John Smith works at Microsoft Corporation in Seattle."
    entities = extract_entities(text)
    persons = _names(entities, "PERSON")
    orgs = _names(entities, "ORGANIZATION")
    assert "John Smith" in persons
    # reference quirks preserved: phase-3 catches "Microsoft Corporation" as a
    # two-word PERSON; the org-suffix scan backtracks only to the previous
    # space, so ORGANIZATION yields the suffix words themselves
    assert "Microsoft Corporation" in persons
    assert set(orgs) == {"Corp", "Corporation"}
    triples = extract_relationships(entities, text)
    # PERSON × ORGANIZATION with "works for" absent ("works at") → ASSOCIATED_WITH
    assert any(p == "ASSOCIATED_WITH" for _s, _o, p in triples)


def test_bench_sentence_alice_stanford():  # benches/graph_construction.rs:72
    text = "Alice Johnson is a professor at Stanford University in California."
    entities = extract_entities(text)
    assert "Alice Johnson" in _names(entities, "PERSON")
    assert "California" in _names(entities, "LOCATION")


def test_predicate_inference_rules():  # mod.rs:820-858
    assert infer_relationship_type("PERSON", "ORGANIZATION", "she works for acme") == "WORKS_FOR"
    assert infer_relationship_type("PERSON", "ORGANIZATION", "he founded acme") == "LEADS"
    assert infer_relationship_type("ORGANIZATION", "PERSON", "the CEO") == "LEADS"
    assert infer_relationship_type("PERSON", "ORGANIZATION", "nothing here") == "ASSOCIATED_WITH"
    assert infer_relationship_type("PERSON", "LOCATION", "born in Paris") == "BORN_IN"
    # reference quirk: bare "from" anywhere triggers BORN_IN
    assert infer_relationship_type("PERSON", "LOCATION", "a letter from home") == "BORN_IN"
    assert infer_relationship_type("PERSON", "LOCATION", "he lives in Paris") == "LOCATED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "based in Berlin") == "HEADQUARTERED_IN"
    assert infer_relationship_type("ORGANIZATION", "LOCATION", "office near") == "LOCATED_IN"
    assert infer_relationship_type("PERSON", "PERSON", "they married") == "MARRIED_TO"
    assert infer_relationship_type("PERSON", "PERSON", "her colleague") == "COLLEAGUE_OF"
    assert infer_relationship_type("PERSON", "PERSON", "met at a party") == "KNOWS"
    assert infer_relationship_type("EVENT", "OBJECT", "whatever") == "RELATED_TO"


def test_entity_id_normalization():  # mod.rs:594, 758-764
    assert normalize_name("John Smith") == "johnsmith"
    assert entity_id_for("John Smith", "PERSON") == "PERSON_johnsmith"
    assert entity_id_for("O'Brien & Co.", "ORGANIZATION") == "ORGANIZATION_obrienco"


def test_clean_word():  # mod.rs:622-628
    assert clean_word("Smith,") == "Smith"
    assert clean_word("O'Connor's") == "O'Connor's"  # internal apostrophes kept
    assert clean_word("word.") == "word"
    assert clean_word("it's'") == "it's"


def test_confidence_scoring():  # mod.rs:700-738
    assert abs(calculate_confidence("John Smith", "PERSON") - 0.8) < 1e-9  # two words + cap
    assert abs(calculate_confidence("Acme Inc", "ORGANIZATION") - 0.9) < 1e-9
    assert abs(calculate_confidence("New York", "LOCATION") - 0.9) < 1e-9
    assert calculate_confidence("plainword", "PERSON") == 0.5


def test_find_mentions_non_overlapping():  # mod.rs:596-608
    assert find_mentions("abab abab", "abab") == [(0, 4), (5, 9)]
    assert find_mentions("aaa", "aa") == [(0, 2)]


def test_dedupe_merges_mentions_and_max_confidence():  # mod.rs:767-788
    text = "Seattle is big. I love Seattle."
    entities = extract_entities(text, ("LOCATION",))
    seattles = [e for e in entities if e.name == "Seattle"]
    # Seattle is not in KNOWN_LOCATIONS → no LOCATION hits; use a known one
    text2 = "Boston is big. I love Boston."
    entities2 = extract_entities(text2, ("LOCATION",))
    bostons = [e for e in entities2 if e.name == "Boston"]
    assert len(bostons) == 1
    assert len(bostons[0].mentions) == 2
    assert not seattles


def test_org_first_occurrence_only():  # mod.rs:501-521 quirk: str::find
    # The suffix scan backtracks to the previous space, so when the suffix is
    # its own word the extracted name IS the suffix; only the FIRST occurrence
    # per suffix is scanned.
    text = "Acme Corp and Beta Corp are rivals."
    entities = extract_entities(text, ("ORGANIZATION",))
    names = _names(entities, "ORGANIZATION")
    assert names == ["Corp"]
    # attached suffix keeps the attached word
    text2 = "He joined AcmeCorp yesterday."
    entities2 = extract_entities(text2, ("ORGANIZATION",))
    assert _names(entities2, "ORGANIZATION") == ["AcmeCorp"]
