#!/usr/bin/env bash
# Reference path compat (datasets/titanic/get_data.sh): delegates to the
# canonical fetch script, which writes data/titanic/titanic.csv.
exec "$(cd "$(dirname "$0")/../.." && pwd)/data/titanic/get_data.sh" "$@"
