"""Sweep the per-position literal-cost calibration (LIT_COST_SCALE16)
over the mixed corpus + alice29 at q10/q11.

Usage: python research/sweep_lit_cost.py [scales...]
"""
import os
import sys
import importlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "research"))


def run(scale):
    os.environ["DIVANS_LIT_COST_SCALE16"] = str(scale)
    import divans_tpu.ir.matcher as m
    importlib.reload(m)
    from divans_tpu.options import DivansOptions
    from divans_tpu import native
    from large_file_study import build_corpus

    alice = open("/root/reference/testdata/alice29", "rb").read()
    corpus = build_corpus(12 << 20)
    rows = {}
    for q, mb in ((10, 1 << 22), (11, 1 << 22)):
        opts = DivansOptions(quality=q, metablock_size=mb)
        ba = native.compress(alice, opts)
        assert native.decompress(ba) == alice
        bc = native.compress(corpus, opts)
        assert native.decompress(bc) == corpus
        rows[q] = (len(ba) / len(alice), len(bc) / len(corpus))
    print(f"scale16={scale:3d}: "
          f"alice q10 {rows[10][0]:.4f} q11 {rows[11][0]:.4f}  "
          f"corpus q10 {rows[10][1]:.4f} q11 {rows[11][1]:.4f}", flush=True)


if __name__ == "__main__":
    scales = [int(a) for a in sys.argv[1:]] or [12, 14, 15, 16, 18]
    for s in scales:
        run(s)
