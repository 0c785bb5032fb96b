#!/bin/bash
# Download DomainNet (cleaned version) + the official train/test splits.
# (reference workflow: data/download_domainnet.sh; URLs are the public
# ai.bu.edu release)
set -euo pipefail
OUT=${1:-domainnet}
mkdir -p "$OUT" && cd "$OUT"

for D in clipart infograph painting quickdraw real sketch; do
  if [ "$D" = "clipart" ] || [ "$D" = "painting" ]; then
    URL="http://csr.bu.edu/ftp/visda/2019/multi-source/groundtruth/${D}.zip"
  else
    URL="http://csr.bu.edu/ftp/visda/2019/multi-source/${D}.zip"
  fi
  [ -d "$D" ] || { wget -c "$URL"; unzip -q "${D}.zip"; rm "${D}.zip"; }
  for SPLIT in train test; do
    F="${D}_${SPLIT}.txt"
    [ -f "$F" ] || wget -c "http://csr.bu.edu/ftp/visda/2019/multi-source/domainnet/txt/${F}"
  done
done
echo "DomainNet ready in $PWD"
