"""Manual signed-URL probe (parity with the reference's test_signing.py).

The reference ships a manual script that builds a GCS client from a service
-account key, checks a blob exists and mints a signed GET URL
(test_signing.py:13-44).  This is the same probe generalized to either
store backend:

    python scripts/probe_signing.py local:///tmp/pam_blobs processed/mastered_x.wav
    python scripts/probe_signing.py gs://my-bucket processed/mastered_x.wav
"""

import sys


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 2
    base, key = argv[1], argv[2]
    scheme = base.split("://", 1)[0]
    if scheme == "local":
        from python_audio_mastering_tpu.serving.store import LocalFSBlobStore

        root = base.split("://", 1)[1] or "/tmp/pam_blobs"
        store = LocalFSBlobStore(root)
    else:
        from python_audio_mastering_tpu.serving.store import GCSBlobStore

        store = GCSBlobStore(base.split("://", 1)[1].split("/")[0])

    print(f"--- Probing {store.scheme}://{store.bucket}/{key} ---")
    if not store.exists(key):
        print("!!! blob NOT found — run a mastering job first.")
        return 1
    print("Blob found. Minting a 15-minute signed GET URL...")
    url = store.signed_get_url(key, expires_s=900)
    print("\n--- SUCCESS ---")
    print(url)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
