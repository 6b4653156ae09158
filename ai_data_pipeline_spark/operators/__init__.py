"""Operator library ("library over engine", SURVEY.md §4): each
operator is a function that takes DataFrames and returns a DataFrame
plan, so Catalyst optimizes composed pipelines end-to-end.
"""
