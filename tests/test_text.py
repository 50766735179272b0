import numpy as np
import pyarrow as pa
import pytest

from raylink.text import (
    batch_ngrams,
    clean_string,
    clean_strings_arrow,
    create_ngrams,
)


def test_clean_string():
    # polyfuzz/models/_tfidf.py:142-146 semantics
    assert clean_string("Hello, World!") == "hello world"
    # \t\n are deleted by the character-class regex (not spaces), so B and
    # C fuse — reference behavior, polyfuzz/models/_tfidf.py:144-145
    assert clean_string("  A  B\t\nC  ") == "a bc"
    assert clean_string("Ab-Cd_12$%") == "abcd12"
    assert clean_string("") == ""
    assert clean_string("!!!") == ""


def test_clean_strings_arrow_matches_scalar():
    strings = [
        "Hello, World!",
        "  A  B\t\nC  ",
        "Ab-Cd_12$%",
        "",
        "!!!",
        "Ünïcode Ödd",
        "MiXeD CaSe 42",
    ]
    got = clean_strings_arrow(pa.array(strings)).to_pylist()
    assert got == [clean_string(s) for s in strings]


@pytest.mark.parametrize("rng", [(3, 3), (2, 4), (1, 1), (3, 6)])
def test_create_ngrams_inclusive_range(rng):
    grams = create_ngrams("hotel", rng, clean=False)
    expected = []
    for n in range(rng[0], rng[1] + 1):
        expected += ["hotel"[i : i + n] for i in range(len("hotel") - n + 1)]
    assert grams == expected


def test_create_ngrams_space_removal():
    assert create_ngrams("ab cd", (3, 3), clean=False) == []
    assert create_ngrams("ab cd", (2, 2), clean=False) == ["ab", "cd"]
    got = create_ngrams("ab cd", (3, 3), clean=False, remove_space_ngrams=False)
    assert got == ["ab ", "b c", " cd"]


def test_create_ngrams_short_string():
    assert create_ngrams("ab", (3, 3), clean=False) == []


def test_batch_ngrams_matches_scalar():
    texts = ["apple pie", "", "ab", "hotel", "a b c d", "xyzzy plugh"]
    cleaned = pa.array(texts)
    for rng in [(3, 3), (2, 4), (1, 2)]:
        doc_ids, grams = batch_ngrams(cleaned, rng, remove_space_ngrams=True)
        got = {}
        for d, g in zip(doc_ids.tolist(), grams.tolist()):
            got.setdefault(d, []).append(g.rstrip(b"\x00").decode())
        for i, t in enumerate(texts):
            expected = sorted(create_ngrams(t, rng, clean=False))
            assert sorted(got.get(i, [])) == expected, (rng, t)


def test_batch_ngrams_keep_space():
    doc_ids, grams = batch_ngrams(pa.array(["ab cd"]), (3, 3), remove_space_ngrams=False)
    got = [g.rstrip(b"\x00").decode() for g in grams.tolist()]
    assert got == ["ab ", "b c", " cd"]


def test_batch_ngrams_sliced_array():
    arr = pa.array(["junk", "hotel", "apple"])[1:]
    doc_ids, grams = batch_ngrams(arr, (3, 3))
    got = {}
    for d, g in zip(doc_ids.tolist(), grams.tolist()):
        got.setdefault(d, []).append(g.rstrip(b"\x00").decode())
    assert got[0] == ["hot", "ote", "tel"]
    assert got[1] == ["app", "ppl", "ple"]


def test_clean_string_properties_hypothesis():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def prop(s):
        c = clean_string(s)
        assert c == clean_string(c)  # idempotent
        assert all(ch.islower() or ch.isdigit() or ch == " " for ch in c)
        assert not c.startswith(" ") and not c.endswith(" ")
        assert "  " not in c
        # arrow kernel agrees
        assert clean_strings_arrow(pa.array([s]))[0].as_py() == c

    prop()


def test_ratio_properties_hypothesis():
    from hypothesis import given, settings, strategies as st

    from raylink import editdist as ed

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet="abcdef ", max_size=20), st.text(alphabet="abcdef ", max_size=20))
    def prop(a, b):
        r = ed.ratio(a, b)
        assert 0.0 <= r <= 100.0
        assert r == ed.ratio(b, a)  # symmetric
        if a == b:
            assert r == 100.0
        w = ed.WRatio(a, b)
        assert 0.0 <= w <= 100.0

    prop()


def test_batch_ngrams_non_ascii_codepoint_exact():
    """clean=False non-ASCII text must gram by CODEPOINTS (the byte-window
    kernel would split multibyte chars); parity with create_ngrams."""
    import numpy as np
    import pyarrow as pa

    from raylink.text import batch_ngrams, create_ngrams

    texts = ["café au lait", "naïve test", "plain ascii", ""]
    d, grams = batch_ngrams(pa.array(texts), (3, 3))
    got: dict[int, list[str]] = {}
    for di, g in zip(d.tolist(), grams.tolist()):
        got.setdefault(di, []).append(g.rstrip(b"\x00").decode("utf-8"))
    for i, t in enumerate(texts):
        want = create_ngrams(t, (3, 3), clean=False)
        assert got.get(i, []) == want, (i, t)


def test_embeddings_to_matrix_ragged_rejected():
    import pyarrow as pa
    import pytest

    from raylink.embed import embeddings_to_matrix

    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="fixed-dimension"):
        embeddings_to_matrix(ragged)
