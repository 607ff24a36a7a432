"""BIO decode unit tests — the reference's exact transition rules
(/root/reference/models/ner_model.py:295-314; SURVEY.md §5.2 item 1)."""

from kgforge.core.bio import decode_bio, encode_bio

T = 6  # num_ent_types; B-t = t+1 in [1,6], I-t = t+7 in [7,12]


def test_simple_b_i_span():
    #        O  B0 I0 I0 O
    tags = [0, 1, 7, 7, 0]
    assert decode_bio(tags, T) == [(1, 4, 0)]


def test_consecutive_b_tags_open_separate_entities():
    tags = [1, 2, 0]  # B0 B1 O
    assert decode_bio(tags, T) == [(0, 1, 0), (1, 2, 1)]


def test_bare_i_without_b_opens_nothing():
    # reference: a bare I with no open run is skipped (start stays False)
    tags = [0, 7, 7, 0]
    assert decode_bio(tags, T) == []


def test_i_after_o_closes_run():
    # B0 O I0 -> the I after close opens nothing
    tags = [1, 0, 7]
    assert decode_bio(tags, T) == [(0, 1, 0)]


def test_i_type_is_ignored_when_extending():
    # reference extends on ANY tag > num_types regardless of its type
    tags = [1, 12, 12]  # B0 I5 I5
    assert decode_bio(tags, T) == [(0, 3, 0)]


def test_b_after_i_starts_new_entity():
    tags = [1, 7, 2, 8]  # B0 I0 B1 I1
    assert decode_bio(tags, T) == [(0, 2, 0), (2, 4, 1)]


def test_sentence_bounds_respected():
    tags = [1, 1, 1]
    assert decode_bio(tags, T, sent_start=1, sent_end=2) == [(1, 2, 0)]


def test_encode_decode_roundtrip():
    mentions = [(0, 2, 3), (4, 5, 1), (6, 9, 5)]
    tags = encode_bio(10, mentions, T)
    assert decode_bio(tags, T) == mentions


def test_encode_overlap_last_wins_prefix():
    # overlapping write: second mention overwrites; decode reflects tags
    tags = encode_bio(5, [(0, 4, 0), (2, 4, 1)], T)
    # tags: B0 I0 B1 I1 O -> two entities
    assert decode_bio(tags, T) == [(0, 2, 0), (2, 4, 1)]
