#!/bin/bash
# Real-SDK smoke for the reflective AWS adapter (r15 VERDICT item 8).
#
# The sandbox has zero egress, so graft.sources.kinesis.AwsKinesisClient
# has only ever been exercised against the in-repo structural stubs
# (AwsKinesisClientSpec's version-skew mutation matrix — the offline
# ceiling). The moment a real AWS SDK v2 kinesis jar set is available,
# THIS is the one command that closes the last untested surface:
# it runs validate() — the full reflective bind of every class/method
# the adapter uses — against the real jars, and (optionally, with
# credentials + a stream) a live listShards round trip.
#
# Usage:
#   tools/real_sdk_smoke.sh <sdk-jar-dir> [streamName region]
#
#   <sdk-jar-dir>: directory containing the AWS SDK v2 jars
#     (kinesis, sdk-core, auth, regions, http clients + their deps —
#     e.g. the lib/ of an unpacked aws sdk v2 bundle, or a single
#     bundle-X.Y.Z.jar directory)
#   [streamName region]: if given AND credentials are in the standard
#     env/profile chain, also performs a live ListShards against the
#     stream (read-only; no records are consumed).
#
# Exit 0 = validate() returned an empty problem list (and the live
# probe, if requested, returned >= 1 shard). Any problem is printed
# verbatim — the same strings the mutation matrix asserts on.
set -euo pipefail
cd "$(dirname "$0")/.."

SDK_DIR="${1:?usage: tools/real_sdk_smoke.sh <sdk-jar-dir> [streamName region]}"
STREAM="${2:-}"
REGION="${3:-us-east-1}"

sbt -batch compile 1>&2
CP="target/scala-2.13/classes:/opt/spark/jars/*:$SDK_DIR/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

exec java $OPENS -cp "$CP" graft.tools.RealSdkSmoke "$STREAM" "$REGION"
