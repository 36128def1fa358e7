"""Trace every Lean repo referenced by the dataset with LeanDojo.

Parity with `/root/reference/scripts/trace_repos.py`. Requires ``lean_dojo``
(the environment dependency, not part of this framework).
"""

import argparse
import json
import logging
from glob import glob

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", type=str, default="data")
    args = parser.parse_args()
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)

    from lean_dojo import LeanGitRepo, is_available_in_cache, trace

    url_commits = set()
    for path in glob(f"{args.data_path}/*/*/*.json"):
        with open(path) as f:
            for ex in json.load(f):
                url_commits.add((ex["url"], ex["commit"]))

    repos = set()
    for url, commit in url_commits:
        repo = LeanGitRepo(url, commit)
        if not is_available_in_cache(repo) and not repo.is_lean4:
            repos.add(repo)

    logger.info("repos to trace: %s", repos)
    for repo in repos:
        trace(repo)


if __name__ == "__main__":
    main()
