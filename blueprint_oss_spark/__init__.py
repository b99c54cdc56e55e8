"""blueprint_oss_spark — a PySpark-native declarative document-extraction
engine with the query surface of instabase/blueprint-oss.

Blueprints (rule programs over fields) compile driver-side and broadcast;
documents — rows of (doc_id, spans) — are processed in bulk by Arrow-batched
grouped UDFs (see blueprint_oss_spark.spark.pipeline).
"""

__version__ = '0.1.0'

from .model.rules import (  # noqa: F401
    AlignmentLine, Atom, Conjunction, Direction, Disjunction, Field,
    Orientation, Predicate, Rule, TextComparisonFlags,
    all_hold, all_rules_hold, any_holds, any_rule_holds, are_aligned,
    are_arranged, are_disjoint, are_equal, are_on_same_page,
    bottom_aligned, bottom_aligned_pair, column, greater_than,
    greater_than_or_equal_to, have_unequal_text, heads_tabular_entry,
    is_address, is_date, is_dollar_amount, is_entire_phrase, is_equal_to,
    is_four_lines, is_greater_than, is_immediate_header, is_in_doc_region,
    is_in_page_region, is_left_to_right_label_value_pair, is_less_than,
    is_nearly_equal_to, is_negative, is_nonnegative, is_one_line,
    is_one_word, is_person_name, is_positive, is_tabular_header,
    is_three_lines, is_top_down_label_value_pair, is_two_lines,
    is_two_words, is_zero, left_aligned, left_aligned_column,
    left_aligned_pair, left_to_right, left_to_right_pair, less_than,
    less_than_or_equal_to, line_count_is, negate, non_fatal, nop,
    no_words_between_horizontally, no_words_between_horizontally_custom,
    no_words_between_vertically, no_words_between_vertically_custom,
    nothing_between_bottom_edge, nothing_between_horizontally,
    nothing_between_horizontally_custom, nothing_between_left_edge,
    nothing_between_right_edge, nothing_between_top_edge,
    nothing_between_vertically, nothing_between_vertically_custom,
    one_line_above, one_to_two_lines_above, page_number_is, penalize,
    right_aligned, right_aligned_column, right_aligned_pair, row,
    sum_is_approximately, sum_is_at_least, sum_is_near_zero,
    sum_is_positive, sum_is_zero, table, tabular_column, tabular_row,
    text_does_not_contain_substring, text_equals, text_has_substring,
    text_is_one_of, text_matches_pattern, text_properties_are, top_down,
    top_down_pair, word_count_is,
)

from .model.nodes import (  # noqa: F401
    CombineNode, EmptyNode, LeafNode, MergeNode, Node, PatternNode,
    PickBestNode, combine, extract, optimize_rule_distribution, pick_best,
)
