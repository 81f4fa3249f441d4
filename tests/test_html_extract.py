"""HTML main-content extraction (C4): the stack-based boilerplate
stripper must recover embedded text EXACTLY, including adversarial
content that looks like markup."""

from __future__ import annotations

from pipeline_kinesis_spark.operators.textops import (
    extract_main_text,
    html_extract_main,
    wrap_in_chrome,
)


def test_adversarial_text_survives_escaping():
    cases = [
        "plain words",
        "a < b && b > c",
        "<script>alert('x')</script>",
        "ampers & entities &amp; &lt;tags&gt;",
        "nested <main><aside>fake chrome</aside></main> in text",
        "newlines\nand\ttabs preserved",
        "unicode: naïve café — ünïcødé ✓",
        "",
    ]
    for did in (0, 4, 13):
        for text in cases:
            got = extract_main_text(wrap_in_chrome(did, text))
            assert got == text, f"mangled {text!r} -> {got!r}"


def test_boilerplate_fully_dropped():
    got = extract_main_text(wrap_in_chrome(13, "only the payload"))
    assert got == "only the payload"
    for leak in ("item", "related", "site", "boilerplate", "©"):
        assert leak not in got


def test_nested_skip_subtrees():
    page = (
        "<main>A<aside>drop<nav>deeper</nav>still dropped</aside>B"
        "<footer>no</footer>C</main><footer>outside</footer>"
    )
    assert extract_main_text(page) == "ABC"


def test_nested_main_tags_depth_tracked():
    # real pages nest/misbalance <main>; a boolean tracker would drop C
    assert extract_main_text("<main>A<main>B</main>C</main>") == "ABC"
    # stray closer before any opener must not go negative
    assert extract_main_text("</main><main>kept</main>") == "kept"


def test_text_outside_main_ignored():
    assert extract_main_text("<body>stray<main>kept</main>tail</body>") == (
        "kept"
    )


def test_operator_end_to_end(spark, sf_dir):
    out = {r.lang: r for r in html_extract_main(spark, sf_dir).collect()}
    assert out
    for lang, row in out.items():
        assert row.exact_matches == row.n_docs, lang


def test_srt_parser_round_trip_and_edges():
    from pipeline_kinesis_spark.operators.textops import (
        format_srt_timestamp,
        parse_srt,
    )

    assert format_srt_timestamp(0) == "00:00:00,000"
    assert format_srt_timestamp(3661234) == "01:01:01,234"
    srt = (
        "1\n00:00:00,000 --> 00:00:01,200\nhello world\n\n"
        "2\n00:00:01,500 --> 00:01:02,750\nmulti\nline cue\n\n"
        "3\n01:00:00,000 --> 01:00:00,001\n\n"
    )
    cues = parse_srt(srt)
    assert cues == [
        (1, 0, 1200, "hello world"),
        (2, 1500, 62750, "multi\nline cue"),
        (3, 3600000, 3600001, ""),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad SRT timing"):
        parse_srt("1\nnot a timing line\ntext")


def test_srt_operator_end_to_end(spark, sf_dir):
    from pipeline_kinesis_spark.operators.textops import srt_caption_stats

    for r in srt_caption_stats(spark, sf_dir).collect():
        assert r.exact_matches == r.n_docs, r.lang


def test_srt_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_kinesis_spark.operators.textops import (
        format_srt_timestamp,
        parse_srt,
    )

    # cue text lines: printable, no blank lines (blank separates cues by
    # design), no leading/trailing whitespace ambiguity
    line = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), blacklist_characters="\n"
        ),
        min_size=1,
        max_size=40,
    ).map(str.strip).filter(bool)

    @settings(max_examples=50, deadline=None)
    @given(
        cues=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3_600_000),
                st.integers(min_value=1, max_value=60_000),
                st.lists(line, min_size=1, max_size=3),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def check(cues):
        srt = "\n\n".join(
            f"{k + 1}\n"
            f"{format_srt_timestamp(start)} --> "
            f"{format_srt_timestamp(start + dur)}\n" + "\n".join(lines)
            for k, (start, dur, lines) in enumerate(cues)
        )
        parsed = parse_srt(srt)
        assert len(parsed) == len(cues)
        for k, ((start, dur, lines), (idx, s, e, text)) in enumerate(
            zip(cues, parsed)
        ):
            assert idx == k + 1
            assert (s, e) == (start, start + dur)
            assert text == "\n".join(lines)

    check()


def test_vtt_parser_header_ids_and_note_blocks():
    from pipeline_kinesis_spark.operators.textops import parse_vtt

    vtt = (
        "WEBVTT\n\n"
        "NOTE this block is ignored\n\n"
        "intro-cue\n00:00:00.000 --> 00:00:01.200\nhello world\n\n"
        "00:00:01.500 --> 00:01:02.750 align:start\nno id\nsecond line\n"
    )
    assert parse_vtt(vtt) == [
        (1, 0, 1200, "hello world"),
        (2, 1500, 62750, "no id\nsecond line"),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="WEBVTT header"):
        parse_vtt("1\n00:00:00,000 --> 00:00:01,200\nsrt not vtt")
    with _pytest.raises(ValueError, match="bad VTT cue"):
        parse_vtt("WEBVTT\n\njust some text without timing")


def test_vtt_spec_edge_forms():
    from pipeline_kinesis_spark.operators.textops import parse_vtt

    # hourless short-form timestamps (the common real-world form)
    assert parse_vtt("WEBVTT\n\n00:01.000 --> 00:02.500\nhi") == [
        (1, 1000, 2500, "hi")
    ]
    # a cue id beginning with NOTE/STYLE/REGION text is NOT a comment
    assert parse_vtt(
        "WEBVTT\n\nNOTE-cue-1\n00:00:00.000 --> 00:00:01.000\nhi"
    ) == [(1, 0, 1000, "hi")]
    # ...but a real NOTE block is
    assert parse_vtt(
        "WEBVTT\n\nNOTE a comment\n\n00:00.000 --> 00:01.000\nhi"
    ) == [(1, 0, 1000, "hi")]
    # malformed signature rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="WEBVTT header"):
        parse_vtt("WEBVTTxyz\n\n00:00:00.000 --> 00:00:01.000\nhi")
    # header label after a space is legal
    assert parse_vtt("WEBVTT label\n\n00:00.000 --> 00:01.000\nx") == [
        (1, 0, 1000, "x")
    ]


def test_text_parsers_contract_on_foreign_input():
    """Foreign-input containment for the three text parsers, mirroring
    the decoder contract (tests/test_decoder_fuzz.py): arbitrary text
    either parses or raises ValueError — never IndexError/KeyError/
    OverflowError — so a hostile caption/page lands in a dead-letter
    path instead of killing an executor task. Mutation strategies echo
    the decoder fuzzer: valid payloads with flipped chars, truncations,
    garbage tails, and pure garbage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_kinesis_spark.operators.textops import (
        extract_main_text,
        format_srt_timestamp,
        parse_srt,
        parse_vtt,
        wrap_in_chrome,
    )

    valid_srt = (
        f"1\n{format_srt_timestamp(0)} --> {format_srt_timestamp(900)}\nhi"
    )
    valid_vtt = "WEBVTT\n\n00:00.000 --> 00:01.000\nhi"
    valid_html = wrap_in_chrome(3, "payload")

    text = st.text(max_size=300)
    payload = st.one_of(
        text,
        *[
            st.tuples(
                st.just(base),
                st.integers(0, max(len(base) - 1, 0)),
                text,
            ).map(lambda t: t[0][: t[1]] + t[2])
            for base in (valid_srt, valid_vtt, valid_html)
        ],
    )

    @settings(max_examples=300, deadline=None)
    @given(payload=payload)
    def check(payload):
        for parser in (parse_srt, parse_vtt, extract_main_text):
            try:
                parser(payload)
            except ValueError:
                pass

    check()
