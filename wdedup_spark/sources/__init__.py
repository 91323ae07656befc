"""Storage + stage-ledger (checkpoint/resume) layer."""
