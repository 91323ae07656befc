"""Pipeline orchestration (the graft's main.cpp:208-222)."""
