"""Scrape SearchResult lines from prover logs -> Pass@1 + solve-time CDF.

Parity with `/root/reference/scripts/stats.py:8-36` (regex over
``SearchResult(...)`` reprs; matplotlib scatter of the time CDF).
"""

import logging
import re
import sys
from glob import glob

import numpy as np

logger = logging.getLogger(__name__)

TOTAL_TIME_REGEX = re.compile(r"total_time=(?P<time>[0-9.eE+-]+)")


def main() -> None:
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)
    total_time = []
    for filename in glob(sys.argv[1]):
        logger.info(filename)
        num_total = num_correct = 0
        with open(filename) as f:
            for line in f:
                if "SearchResult" in line:
                    num_total += 1
                    if "Proved" in line:
                        num_correct += 1
                        m = TOTAL_TIME_REGEX.search(line)
                        if m:
                            total_time.append(float(m["time"]))
        if num_total == 0:
            logger.info("Pass@1: N/A")
        else:
            logger.info(
                "Pass@1: %d / %d = %s", num_correct, num_total, num_correct / num_total
            )

    if total_time:
        logger.info("average time: %s", np.mean(total_time))
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            total_time.sort()
            plt.scatter(total_time, np.arange(1, len(total_time) + 1))
            plt.xlabel("time (s)")
            plt.ylabel("# proved")
            plt.savefig("stats.pdf")
            logger.info("figure saved to stats.pdf")
        except ImportError:
            logger.warning("matplotlib not installed; skipping the CDF plot")


if __name__ == "__main__":
    main()
