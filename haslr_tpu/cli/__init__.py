"""Pipeline driver CLI (bin/haslr.py equivalent)."""
