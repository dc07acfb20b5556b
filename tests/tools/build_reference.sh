#!/bin/sh
# Build the reference bam-somaticsniper binary from /root/reference into
# /tmp/ref (or $1).  Used by bench.py so vs_baseline is timed LIVE on
# this host instead of falling back to the recorded constant; also the
# oracle-fixture regeneration recipe (see README.md here).
set -e
DEST="${1:-/tmp/ref}"
REF="${SNIPER_REFERENCE_DIR:-/root/reference}"
[ -x "$DEST/bam-somaticsniper" ] && exit 0
mkdir -p "$DEST" && cd "$DEST"
[ -d samtools-0.1.6 ] || {
    tar xzf "$REF/vendor/samtools-0.1.6.tar.gz"
    (cd samtools-0.1.6 && patch -Np1 < "$REF/vendor/samtools.patch")
}
[ -f samtools-0.1.6/libbam.a ] || \
    (cd samtools-0.1.6 && make lib CFLAGS="-g -O2 -fcommon -Wno-all" >/dev/null)
mkdir -p sniper/version
printf '#pragma once\nstatic const char* __g_prog_version="ref";\nstatic const char* __g_commit_hash="oracle";\nstatic const char* __g_build_type="";\n' \
    > sniper/version/version.h
gcc -O2 -fcommon -I samtools-0.1.6 -I "$REF/src/lib" \
    -I "$REF/src/lib/sniper" -I sniper/version \
    -o bam-somaticsniper "$REF/src/exe/bam-somaticsniper/main.c" \
    "$REF"/src/lib/sniper/*.c samtools-0.1.6/libbam.a -lm -lz -lpthread
echo "built $DEST/bam-somaticsniper"
