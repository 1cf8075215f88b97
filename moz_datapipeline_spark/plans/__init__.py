"""Pipeline runner — the engine's replacement for the reference's
bash orchestration (base-network.sh / preparation.sh / indicators.sh).
"""
