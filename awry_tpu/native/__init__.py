"""Native (C++) components, compiled on demand.

A real package (not just a data directory) so setuptools' packages.find
includes it and the package-data entry shipping sais.cpp in wheels/sdists
applies; without it, installed copies silently fell back to the NumPy
prefix-doubling SA builder."""
