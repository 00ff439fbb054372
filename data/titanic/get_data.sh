#!/usr/bin/env bash
# Fetch the public Titanic CSV into data/titanic/titanic.csv — mirrors the
# reference's datasets/titanic/get_data.sh. Idempotent. When the file is
# absent (e.g. no network), TitanicDataset generates a deterministic
# schema-exact synthetic stand-in instead.
set -e
DIR="$(cd "$(dirname "$0")" && pwd)"
TARGET="$DIR/titanic.csv"
if [ -f "$TARGET" ]; then
    echo "Already present: $TARGET"
    exit 0
fi
URL="https://raw.githubusercontent.com/datasciencedojo/datasets/master/titanic.csv"
wget -O "$TARGET" "$URL"
echo "Fetched $TARGET"
