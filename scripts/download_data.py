"""Download LeanDojo Benchmark 4 into ``./data``.

Parity with `/root/reference/scripts/download_data.py`: Zenodo tarball +
MD5 verification + extraction (uses urllib instead of shelling out to wget).
"""

import argparse
import hashlib
import logging
import os
import tarfile
import urllib.request

logger = logging.getLogger(__name__)

LEANDOJO_BENCHMARK_4_URL = (
    "https://zenodo.org/records/12740403/files/leandojo_benchmark_4.tar.gz?download=1"
)
DOWNLOADS = {
    LEANDOJO_BENCHMARK_4_URL: "25e1ee60cd8925b9d2e8673ddcc34b4c",
}


def check_md5(filename: str, gt_hashcode: str) -> bool:
    if not os.path.exists(filename):
        return False
    hasher = hashlib.md5()
    with open(filename, "rb") as f:
        while block := f.read(64 * (1 << 20)):
            hasher.update(block)
    return hasher.hexdigest() == gt_hashcode


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", type=str, default="data")
    args = parser.parse_args()
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)

    os.makedirs(args.data_path, exist_ok=True)
    for url, hashcode in DOWNLOADS.items():
        path = os.path.join(args.data_path, os.path.basename(url.split("?")[0]))
        logger.info("downloading %s", url)
        urllib.request.urlretrieve(url, path)
        if not check_md5(path, hashcode):
            raise RuntimeError(f"MD5 of {path} does not match the ground truth.")
        logger.info("extracting %s", path)
        with tarfile.open(path) as tar:
            tar.extractall(args.data_path)
        os.remove(path)
    logger.info("done")


if __name__ == "__main__":
    main()
