"""Truncate an SBC durable-partial store to its completed replicates and
run the rank root-cause analysis on them (the honest partial-arm path of
chain18 [Sb'] when the full 50-replicate ridge arm doesn't fit the
session).  CPU-safe.

Usage: python scripts/truncate_sbc_partial.py <partial.npz> <tag-prefix>
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        'sbc_study/sbc_nuts_ridge_partial.npz'
    prefix = sys.argv[2] if len(sys.argv) > 2 else 'nuts_ridge_partial'
    d = np.load(src)
    done = int(d['done'])
    if done < 5:
        sys.exit('only {} replicates completed; too few to analyze'
                 .format(done))
    out = src.replace('_partial.npz', '_ranks_partial')
    np.savez(out, ranks=d['ranks'][:done], L=d['L'],
             truths=d['truths'][:done], names=d['names'])
    print('truncated partial to {} replicates -> {}.npz'.format(done, out))
    subprocess.run([sys.executable, 'scripts/analyze_sbc_ranks.py',
                    out + '.npz', '{}{}'.format(prefix, done)], check=True)


if __name__ == '__main__':
    main()
