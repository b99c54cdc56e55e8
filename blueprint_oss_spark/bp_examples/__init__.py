"""Example blueprint programs re-expressed in the blueprint_oss_spark DSL.

These mirror the reference's sample programs (the "queries" a blueprint
user runs today) so that a user of instabase/blueprint-oss can switch
engines without rewriting their models.
"""
