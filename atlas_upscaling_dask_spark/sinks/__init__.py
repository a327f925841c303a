"""Sinks — K1-K6 of SURVEY.md §2.2, Spark-native."""
