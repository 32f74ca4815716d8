"""Native host components (C++): SA-IS suffix sorting and FASTA parsing."""
