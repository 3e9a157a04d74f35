#!/usr/bin/env bash
# Build the native cores (AES-NI CSPRNG + BLS12-446 MSM/powers).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -maes -shared -fPIC -o libtfhe_aes.so aes_ctr.cpp
g++ -O3 -march=native -fopenmp -shared -fPIC -o libtfhe_bls446.so bls446.cpp
echo built: libtfhe_aes.so libtfhe_bls446.so
