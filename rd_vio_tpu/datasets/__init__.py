"""Dataset adapters: EuRoC / ADVIO readers and the synthetic simulator."""
