"""CLI round-trips for the round-3 commands (in-process main(argv))."""

import json

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.__main__ import main
from vframe_ray.index.build import build_index


def _mk_index(tmp_path, name="cli_idx", prefix="c"):
    rows = [{"conv_id": f"{prefix}{i}", "turn_idx": 0,
             "text": f"alpha w{i % 4} beta needle"[:64]} for i in range(12)]
    idx = str(tmp_path / name)
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    return idx


def _lines(capsys):
    return [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]


def test_cli_query_modes(ray_session, tmp_path, capsys):
    idx = _mk_index(tmp_path)
    assert main(["query", "--index", idx, "--query", "needle alpha",
                 "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["rank"] == 1

    assert main(["query", "--index", idx, "--query", "al*",
                 "-k", "3"]) == 0
    assert _lines(capsys)

    assert main(["query", "--index", idx, "--query", "needle",
                 "--must", "alpha", "--must-not", "w1", "-k", "12"]) == 0
    got = _lines(capsys)
    assert got and all("w1" not in r["conv_id"] for r in got)

    assert main(["query", "--index", idx, "--query", "neddle",
                 "--fuzzy", "1", "-k", "2"]) == 0
    assert _lines(capsys)                 # neddle -> needle

    assert main(["query", "--index", idx, "--phrase", "beta needle",
                 "-k", "2"]) == 0
    assert _lines(capsys)


def test_cli_after_cursor_with_comma_conv(ray_session, tmp_path, capsys):
    """--after cursors survive conv_ids that contain commas: score is
    before the first comma, turn after the last (ADVICE r3)."""
    rows = [{"conv_id": f"a,b,{i}", "turn_idx": 0,
             "text": "needle haystack"} for i in range(4)]
    idx = str(tmp_path / "comma_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    assert main(["query", "--index", idx, "--query", "needle",
                 "-k", "2"]) == 0
    page1 = _lines(capsys)
    assert len(page1) == 2
    last = page1[-1]
    cursor = f"{last['score']},{last['conv_id']},{last['turn_idx']}"
    assert main(["query", "--index", idx, "--query", "needle",
                 "-k", "2", "--after", cursor]) == 0
    page2 = _lines(capsys)
    assert len(page2) == 2
    assert {r["conv_id"] for r in page1}.isdisjoint(
        r["conv_id"] for r in page2)


def test_cli_no_boost_treats_caret_literally(ray_session, tmp_path,
                                             capsys):
    """--no-boost opts out of the automatic '^' boost rerouting
    (ADVICE r3): the query falls through to plain search, where the
    analyzer strips the caret."""
    idx = _mk_index(tmp_path, name="noboost_idx")
    assert main(["query", "--index", idx, "--query", "needle^2",
                 "--no-boost", "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["rank"] == 1


def test_cli_delete_and_merge(ray_session, tmp_path, capsys):
    idx = _mk_index(tmp_path, "cli_del")
    assert main(["delete", "--index", idx, "--conv", "c0",
                 "--conv", "c1"]) == 0
    assert _lines(capsys)[0]["n_deleted_docs"] == 2
    assert main(["query", "--index", idx, "--query", "needle",
                 "-k", "12"]) == 0
    assert all(r["conv_id"] not in ("c0", "c1") for r in _lines(capsys))

    other = _mk_index(tmp_path, "cli_b", prefix="d")   # disjoint corpus
    out = str(tmp_path / "cli_merged")
    assert main(["merge", "--index", idx, "--index", other,
                 "--out", out, "--segments", "2"]) == 0
    assert _lines(capsys)[0]["n_docs"] == 22      # 12 - 2 purged + 12


def test_cli_wildcard_and_correct(ray_session, tmp_path, capsys):
    """Mid-pattern wildcards route through search_like_index; --correct
    prints did-you-mean rows."""
    idx = _mk_index(tmp_path)
    assert main(["query", "--index", idx, "--query", "n?edle",
                 "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["rank"] == 1

    assert main(["query", "--index", idx, "--query", "*eta",
                 "-k", "3"]) == 0
    assert _lines(capsys)                 # leading wildcard -> beta

    assert main(["query", "--index", idx, "--correct", "neddle",
                 "--correct", "qqqqq"]) == 0
    got = _lines(capsys)
    assert got == [{"query_term": "neddle", "suggestion": "needle",
                    "df": 12}]


def test_cli_wildcard_routing_edges(ray_session, tmp_path, capsys):
    """Mixed-punctuation stems keep the legacy prefix path (no crash);
    a bare '?' amid punctuation is punctuation, not a wildcard."""
    idx = _mk_index(tmp_path)
    # 'alpha-x al*' -> not a clean wildcard token set ('alpha-x' has
    # no wildcard, 'al*' is clean) ... but 'foo-bar*' itself must not
    # crash: legacy prefix path tokenizes the stem
    assert main(["query", "--index", idx, "--query", "needle-x al*",
                 "-k", "3"]) == 0
    assert _lines(capsys)                 # like path: al* -> alpha
    # the crash shape: punctuation INSIDE the wildcard token itself
    assert main(["query", "--index", idx, "--query", "needle-al*",
                 "-k", "3"]) == 0
    assert _lines(capsys)                 # legacy prefix path, no crash
    # natural-language '?' stays plain search (tokenizer strips it)
    assert main(["query", "--index", idx, "--query", "is needle here?!",
                 "-k", "3"]) == 0
    assert _lines(capsys)
    # BARE trailing '?' on a clean token (ADVICE r4): "needle?" must
    # NOT route to LIKE 'needle_' (which can never match the term
    # 'needle') — it is a plain question and must hit the term.
    assert main(["query", "--index", idx, "--query", "is this needle?",
                 "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["rank"] == 1
    # a mid-token '?' is still a real wildcard ("n?edle" test above),
    # and so is a trailing '?' alongside a '*' in the same token
    from vframe_ray.__main__ import _clean_wildcards
    assert _clean_wildcards(["is this needle?"]) is False
    assert _clean_wildcards(["needl?"]) is False      # single trailing
    assert _clean_wildcards(["n?edle"]) is True
    assert _clean_wildcards(["needle??"]) is True     # doubled = explicit
    assert _clean_wildcards(["needl*?"]) is True      # '*' marks intent


def test_cli_span_first_mode(ray_session, tmp_path, capsys):
    """--first N routes to span_first_search_index: 'beta' is at
    position 2 in every doc, so --first 2 misses and --first 3 hits."""
    idx = _mk_index(tmp_path, name="cli_sf")
    assert main(["query", "--index", idx, "--query", "beta",
                 "--first", "2", "-k", "5"]) == 0
    assert _lines(capsys) == []
    assert main(["query", "--index", idx, "--query", "beta",
                 "--first", "3", "-k", "5"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["rank"] == 1
