"""A/B the BSR matvec lowerings on the chip (OSQP_TPU_BSR_MV variants).

The round-5 BSR row measured 72.9 GB/s of stored-byte bandwidth vs DIA's
161 and dense's 699 — this probe isolates which half (the segment gather
or the block reduce) is slow by timing each lowering on the bench's
clustered shape.  Run AFTER any ladder/bench job finishes (one TPU client
at a time on the axon tunnel).

    python tools/bsr_mv_ab.py [n] [m]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 24576
    import bench

    rows = []
    for variant in ('einsum', 'reduce', 'onehot'):
        os.environ['OSQP_TPU_BSR_MV'] = variant
        r = bench.kkt_sparse_probe(n=n, m=m, iters=20, fmt='bsr', clustered=True)
        r['variant'] = variant
        rows.append(r)
        print(json.dumps(r), flush=True)
    best = min(rows, key=lambda r: r['matvec_us'])
    print(json.dumps({'best_variant': best['variant'],
                      'matvec_us': best['matvec_us'],
                      'gbytes_per_s': best['gbytes_per_s']}))


if __name__ == '__main__':
    main()
