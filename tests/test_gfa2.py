"""GFA 2.0 emission (reference dialect, assemble/mod.rs:119-253): the output
must pass a strict positional GFA2 check — mandatory <len> column on S lines,
E lines with $-terminated end coordinates, U group lines."""

import re

from jtk_tpu.io.gfa import contigs_to_gfa, contigs_to_gfa2


def _validate_gfa2(text: str):
    """Minimal strict GFA2 validator (spec: github.com/GFA-spec, GFA2)."""
    segs = {}
    saw_header = False
    pos_re = re.compile(r"^\d+\$?$")
    for ln, line in enumerate(text.splitlines(), 1):
        f = line.split("\t")
        t = f[0]
        if t == "H":
            assert "VN:Z:2.0" in f[1:], f"line {ln}: bad header"
            saw_header = True
        elif t == "S":
            assert len(f) >= 4, f"line {ln}: S needs sid,slen,seq"
            name, slen, seq = f[1], f[2], f[3]
            assert slen.isdigit(), f"line {ln}: slen not int"
            assert seq == "*" or len(seq) == int(slen), \
                f"line {ln}: slen != len(seq)"
            segs[name] = int(slen)
        elif t == "E":
            assert len(f) >= 9, f"line {ln}: E needs 9 columns"
            _eid, sid1, sid2 = f[1], f[2], f[3]
            for sid in (sid1, sid2):
                assert sid[-1] in "+-", f"line {ln}: sid missing orientation"
                assert sid[:-1] in segs, f"line {ln}: unknown segment {sid}"
            for k, sid in ((4, sid1), (6, sid2)):
                beg, end = f[k], f[k + 1]
                assert pos_re.match(beg) and pos_re.match(end), \
                    f"line {ln}: bad positions {beg},{end}"
                L = segs[sid[:-1]]
                for p in (beg, end):
                    v = int(p.rstrip("$"))
                    assert v <= L, f"line {ln}: pos {p} beyond {L}"
                    # $ is REQUIRED exactly when the position == segment end
                    assert (p.endswith("$")) == (v == L), \
                        f"line {ln}: $-marking wrong on {p} (len {L})"
                assert int(beg.rstrip("$")) <= int(end.rstrip("$"))
            assert f[8] == "*" or re.match(r"^(\d+[MDIP])+$", f[8]), \
                f"line {ln}: bad alignment {f[8]}"
        elif t == "U":
            assert len(f) >= 3, f"line {ln}: U needs uid + items"
            for name in f[2].split(" "):
                assert name in segs, f"line {ln}: unknown member {name}"
        elif t in ("F", "G", "O", "#"):
            pass
        else:
            raise AssertionError(f"line {ln}: unknown record {t}")
    assert saw_header and segs


def _mock_contigs():
    c0 = {"seq": "ACGTACGTACGTACGTACGT",
          "summary": [(0, 0, True, 20, 1), (1, 0, True, 22, 1)]}
    c1 = {"seq": "TTTTCCCCGGGGAAAA",
          "summary": [(2, 0, True, 40, 2)]}
    c2 = {"seq": "ACACACACAC", "summary": [(3, 1, False, 21, 1)]}
    links = [(0, "+", 1, "+", 18, 0), (1, "-", 2, "+", 9, -4)]
    return [c0, c1, c2], links

def test_gfa2_output_validates():
    contigs, links = _mock_contigs()
    text = contigs_to_gfa2(contigs, links)
    _validate_gfa2(text)
    assert "cp:i:2" in text          # copy-number tags survive
    assert "\nU\tcp:i:1\t" in text   # group records present
    assert "4M" in text              # negative offset -> overlap CIGAR


def test_gfa2_matches_gfa1_content():
    contigs, links = _mock_contigs()
    g1 = contigs_to_gfa(contigs, links)
    g2 = contigs_to_gfa2(contigs, links)
    s1 = [l.split("\t")[1] for l in g1.splitlines() if l.startswith("S")]
    s2 = [l.split("\t")[1] for l in g2.splitlines() if l.startswith("S")]
    assert s1 == s2
    assert g1.count("\nL\t") == g2.count("\nE\t")
