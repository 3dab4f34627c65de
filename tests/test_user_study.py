"""User-study tooling: manifest schema, randomization, scoring.

Covers the sup-mat/user-study functionality of the reference
(pair manifests `first,second,appearance` — e.g.
sup-mat/user-study/mocogan-taichi.csv — and the AMT HIT page templates
amt_transfer.html / amt_prediction.html).
"""

import csv
import os
import subprocess
import sys

import pytest

from monkeynet_tpu.utils import user_study as us

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_outputs(tmp_path, n=12):
    ours = tmp_path / "ours"
    base = tmp_path / "baseline"
    app = tmp_path / "appearance"
    for d in (ours, base, app):
        d.mkdir()
    for i in range(n):
        cid = f"{i:08d}"
        (ours / f"mtm-{cid}.gif").write_bytes(b"GIF89a")
        (base / f"x2face-{cid}.gif").write_bytes(b"GIF89a")
        (app / f"{cid}.jpg").write_bytes(b"\xff\xd8\xff")
    return ours, base, app


def test_manifest_schema_matches_reference(tmp_path):
    """Header + per-row shape equal the reference CSVs' schema."""
    ours, base, app = _mk_outputs(tmp_path)
    rows = us.make_manifest(str(ours), str(base), str(app),
                            study_name="ours-vs-x2face", seed=1)
    path = tmp_path / "manifest.csv"
    us.write_manifest(rows, str(path))
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        body = list(reader)
    assert header == ["first", "second", "appearance"]
    assert len(body) == 12
    for first, second, appearance in body:
        assert first.startswith("ours-vs-x2face/")
        assert second.startswith("ours-vs-x2face/")
        assert appearance.startswith("ours-vs-x2face/")
        assert first.endswith(".gif") and second.endswith(".gif")
        assert appearance.endswith(".jpg")
        # each row pairs the SAME clip id across methods + appearance
        ids = {us._clip_id(p) for p in (first, second, appearance)}
        assert len(ids) == 1


def test_randomization_is_seeded_and_balanced(tmp_path):
    ours, base, app = _mk_outputs(tmp_path, n=64)
    r1 = us.make_manifest(str(ours), str(base), str(app), seed=7)
    r2 = us.make_manifest(str(ours), str(base), str(app), seed=7)
    r3 = us.make_manifest(str(ours), str(base), str(app), seed=8)
    assert r1 == r2  # deterministic under a fixed seed
    assert r1 != r3  # and the seed actually matters
    # A/B placement is randomized, not constant
    firsts = sum(r.ours_is_first for r in r1)
    assert 8 < firsts < 56
    # row order is shuffled relative to sorted ids
    assert [us._clip_id(r.first) for r in r1] != sorted(
        us._clip_id(r.first) for r in r1
    )


def test_make_requires_shared_ids_and_complete_appearance(tmp_path):
    ours, base, app = _mk_outputs(tmp_path, n=3)
    os.remove(app / "00000001.jpg")
    with pytest.raises(ValueError, match="appearance images missing"):
        us.make_manifest(str(ours), str(base), str(app))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no shared clip ids"):
        us.make_manifest(str(ours), str(empty))


def test_page_flavors(tmp_path):
    ours, base, app = _mk_outputs(tmp_path, n=4)
    rows = us.make_manifest(str(ours), str(base), str(app), seed=0)
    local = us.render_study_page(rows, mode="transfer", flavor="local")
    # every pair present, with its media and an answer-key-free form
    assert local.count('<section class="pair"') == 4
    for r in rows:
        assert r.first in local and r.second in local
    assert "ours" not in local.lower().replace("monkeynet", "")
    assert "responses.csv" in local  # the export script shipped
    # template flavor keeps AMT's ${...} substitution contract
    tmpl = us.render_study_page(rows, mode="prediction", flavor="template")
    for ph in ("${first}", "${second}", "${video}"):
        assert ph in tmpl
    assert tmpl.count('<section class="pair"') == 1


def test_analyze_undoes_randomization(tmp_path):
    """Votes recorded as optionA/optionB score correctly for 'ours'
    regardless of which slot the randomizer put ours in."""
    ours, base, app = _mk_outputs(tmp_path, n=20)
    rows = us.make_manifest(str(ours), str(base), str(app), seed=3)
    key = tmp_path / "key.csv"
    us.write_key(rows, str(key))
    # Synthetic raters: ours wins 15 of 20
    resp = tmp_path / "responses.csv"
    with open(resp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["first", "choice"])
        for i, r in enumerate(rows):
            ours_wins = i < 15
            picked_first = r.ours_is_first if ours_wins else not r.ours_is_first
            w.writerow([r.first, "optionA" if picked_first else "optionB"])
    res = us.analyze_responses(str(resp), str(key))
    assert res.n == 20 and res.ours_votes == 15
    assert res.ours_share == pytest.approx(0.75)
    lo, hi = res.ci95
    assert lo < 0.75 < hi and 0 < lo < hi < 1
    # exact two-sided sign test for 15/20 vs fair coin
    assert res.p_value == pytest.approx(0.04139, abs=2e-4)


def test_analyze_rejects_unknown_rows(tmp_path):
    ours, base, app = _mk_outputs(tmp_path, n=2)
    rows = us.make_manifest(str(ours), str(base), str(app))
    key = tmp_path / "key.csv"
    us.write_key(rows, str(key))
    resp = tmp_path / "responses.csv"
    with open(resp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["first", "choice"])
        w.writerow(["nonexistent.gif", "optionA"])
    with pytest.raises(ValueError, match="not in key"):
        us.analyze_responses(str(resp), str(key))


def test_cli_end_to_end(tmp_path):
    """make -> page -> analyze through the script entry point."""
    ours, base, app = _mk_outputs(tmp_path, n=6)
    out = tmp_path / "study"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    run = lambda *a: subprocess.run(  # noqa: E731
        [sys.executable, os.path.join(REPO, "scripts", "user_study.py"), *a],
        check=True, capture_output=True, text=True, env=env,
    )
    r = run("make", "--ours", str(ours), "--baseline", str(base),
            "--appearance", str(app), "--out", str(out), "--seed", "2")
    assert "6 pairs" in r.stdout
    assert (out / "manifest.csv").exists() and (out / "key.csv").exists()
    r = run("page", "--manifest-dir", str(out), "--mode", "transfer")
    assert (out / "index.html").exists()
    # build responses where ours always wins, then score via CLI
    rows = []
    with open(out / "key.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    resp = tmp_path / "responses.csv"
    with open(resp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["first", "choice"])
        for kr in rows:
            w.writerow([kr["first"],
                        "optionA" if int(kr["ours_is_first"]) else "optionB"])
    r = run("analyze", "--responses", str(resp), "--key", str(out / "key.csv"))
    assert "ours preferred 6 (100.0%)" in r.stdout
