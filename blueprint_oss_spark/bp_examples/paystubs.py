"""Paystub extraction model — the flagship sample program, re-expressed in
the blueprint_oss_spark DSL (semantics mirror the reference program at
/root/reference/examples/paystubs/paystubs.py; rule constants are part of
the model definition, i.e. the user's query, not engine code).

Ported model definition: the rule constants and layout structure are
the workload itself and match the MIT-licensed reference example by
design (parity with that model is the goal); the engine executing it
is this repo's own.

Structure: five vendor templates + a long-tail of label/value and tabular
patterns, wrapped in pick_best, with business-logic inequality rules at
the root.  Extracted fields: period/YTD gross and net pay, period begin /
end dates, pay date.
"""

from __future__ import annotations

from ..model.nodes import Node, combine, extract, pick_best
from ..model.rules import (
    AlignmentLine, Direction, Field, Predicate, TextComparisonFlags,
    all_hold, any_holds, are_aligned, are_arranged, heads_tabular_entry,
    is_date, is_dollar_amount, is_entire_phrase, is_immediate_header,
    is_left_to_right_label_value_pair, is_top_down_label_value_pair,
    left_aligned_column, no_words_between_horizontally,
    no_words_between_vertically, nothing_between_horizontally,
    nothing_between_vertically, right_aligned_column, row,
    sum_is_positive, tabular_column, tabular_row, text_equals,
)


def _label(*specs) -> Predicate:
  """any_holds over text_equals variants; each spec is a plain string or
  (string, kwargs) for per-entry tolerance/taper/flags overrides."""
  preds = []
  for s in specs:
    if isinstance(s, tuple):
      preds.append(text_equals(s[0], **s[1]))
    else:
      preds.append(text_equals(s))
  return any_holds(*preds)


def _whole(text: str, **kw) -> Predicate:
  return all_hold(text_equals(text, **kw), is_entire_phrase)


# ---------------------------------------------------------------------------
# Label vocabularies.
# ---------------------------------------------------------------------------

is_restrictive_gross_pay_label = _label(
    'Gross earnings', 'Gross pay', 'Gross wages', 'Gross (less imputed)',
    'Total earnings', 'Total compensation',
    ('Total wages', dict(tolerance=0)), 'Total pay', 'Total gross',
    'Salary & other income')

is_gross_pay_label = any_holds(
    is_restrictive_gross_pay_label, _whole('Earnings'), _whole('Gross'))

is_permissive_gross_pay_label = any_holds(
    is_gross_pay_label, _whole('Total'), _whole('Totals'),
    text_equals('Total:'), text_equals('Totals:'))

is_period_gross_pay_label = any_holds(
    is_restrictive_gross_pay_label,
    _label('Cur. earnings', 'Current gross', 'Current earnings'))

is_ytd_gross_pay_label = _label(
    'Year to date gross', 'Gross year-to-date', 'YTD earnings',
    'YTD total gross', 'Y.T.D earnings', 'YTD gross', 'Y.T.D. gross',
    'Gross YTD')

is_net_pay_label = _label(
    ('Net pay', dict(tolerance=0)),  # don't catch 'OT pay', 'Reg pay'
    'Net pay:', 'Net check', 'Net check:', 'Net earnings',
    '**NET EARNINGS**', 'Net deposit', 'Total net pay', 'Equals net pay',
    'Total net', 'Direct deposit', 'Direct deposit total',
    'Net direct deposit', 'Take home', 'Net pay to checking')

is_period_net_pay_label = any_holds(
    is_net_pay_label,
    _label('Current net pay', 'Check amount', 'Net wages/period'))

is_ytd_net_pay_label = _label(
    'Year to date net pay', 'YTD net pay', 'Net year-to-date',
    'Net pay year-to-date:', 'Net YTD', 'Net pay Y.T.D', 'Net pay Y-T-D',
    'Net wages YTD')

is_period_pay_label = _label(
    ('P/P', dict(tolerance=0, taper=0)), 'Current', 'Current pay',
    'Current period', 'Current earnings/ded', 'Current totals:',
    'Current ($)', 'This period', 'This check', 'This period ($)',
    'Amount')

is_ytd_pay_label = any_holds(
    _label('Year to date', 'YR TO DATE', 'Year-to-date',
           'Year-to-date totals:', 'Year-to-date earnings/ded', 'Y-T-D',
           'Y.T.D. amount'),
    _whole('YTD', text_comparison_flags=TextComparisonFlags.CASE_SENSITIVE,
           tolerance=0, taper=1),
    _label(('YTD:', dict(tolerance=0, taper=0)), 'YTD amount',
           ('To date', dict(tolerance=0, taper=1)), 'YTD ($)', 'Calendar'))

is_earnings_label = _label(
    'Earnings', 'Wages', 'Current earnings', 'Current hours & earnings',
    'Hours and earnings', 'Gross earnings')

is_description_label = _label('Description', 'Type', 'Code')

is_period_begin_label = _label(
    'Period Beginning:', 'Period Beginning Date', 'Period Begin',
    'Period Start', 'Period Starting:', 'Period Start Date',
    'Pay Begin Date:', 'Check stub for the period:', 'Pay period start',
    'Pay period begin', 'Start period', 'Pay BegDt', 'Pay Start')

is_period_end_label = _label(
    'Period Ending:', 'Period Ending Date', 'Period End:',
    'Period End Date', 'Pay End Date:', 'END DATE', 'Pay period end',
    'Pay EndDt', 'Pay End', 'End period')

is_pay_period_label = _label(
    'Pay Period:', 'Pay Period from', 'Period Dates', 'For period:',
    'Pay stub for period:', 'Inclusive Dates:', 'Period Beg/End:')

is_pay_date_label = _label(
    'Check Date:', 'Pay Date:', 'Payment Date', 'Deposit Date',
    'Paid Date:', 'Advice Date:', 'with a pay date of')


# ---------------------------------------------------------------------------
# Long tail.
# ---------------------------------------------------------------------------

def _lv(name: str, label_pred: Predicate, label_f: str, value_pred,
        value_f: str, pair_pred: Predicate) -> Node:
  return extract(
      label_pred(label_f), value_pred(value_f),
      pair_pred(label_f, value_f)).with_name(name)


ltr_period_begin_date = _lv(
    'LTR period begin date', is_period_begin_label, 'period_begin_label',
    is_date, 'period_begin_date', is_left_to_right_label_value_pair)
ltr_period_end_date = _lv(
    'LTR period end date', is_period_end_label, 'period_end_label',
    is_date, 'period_end_date', is_left_to_right_label_value_pair)
ltr_pay_date = _lv(
    'LTR pay date', is_pay_date_label, 'pay_date_label', is_date,
    'pay_date', is_left_to_right_label_value_pair)
top_down_period_begin_date = _lv(
    'top-down period begin date', is_period_begin_label,
    'period_begin_label', is_date, 'period_begin_date',
    is_top_down_label_value_pair)
top_down_period_end_date = _lv(
    'top-down period end date', is_period_end_label, 'period_end_label',
    is_date, 'period_end_date', is_top_down_label_value_pair)
top_down_pay_date = _lv(
    'top-down pay date', is_pay_date_label, 'pay_date_label', is_date,
    'pay_date', is_top_down_label_value_pair)

pay_period_date_range = extract(
    is_pay_period_label('pay_period_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    row('pay_period_label', 'period_begin_date', 'period_end_date'),
    nothing_between_horizontally('pay_period_label', 'period_begin_date'))

ltr_period_gross_pay = _lv(
    'LTR period gross pay', is_period_gross_pay_label,
    'period_gross_pay_label', is_dollar_amount, 'period_gross_pay',
    is_left_to_right_label_value_pair)
ltr_period_net_pay = _lv(
    'LTR period net pay', is_period_net_pay_label,
    'period_net_pay_label', is_dollar_amount, 'period_net_pay',
    is_left_to_right_label_value_pair)
one_line_down_period_net_pay = _lv(
    'one line down period net pay', is_period_net_pay_label,
    'period_net_pay_label', is_dollar_amount, 'period_net_pay',
    all_hold(is_immediate_header, heads_tabular_entry))
ltr_ytd_gross_pay = _lv(
    'LTR YTD gross pay', is_ytd_gross_pay_label, 'ytd_gross_pay_label',
    is_dollar_amount, 'ytd_gross_pay',
    is_left_to_right_label_value_pair)
ltr_ytd_net_pay = _lv(
    'LTR YTD net pay', is_ytd_net_pay_label, 'ytd_net_pay_label',
    is_dollar_amount, 'ytd_net_pay', is_left_to_right_label_value_pair)
top_down_period_gross_pay = _lv(
    'top-down period gross pay', is_period_gross_pay_label,
    'period_gross_pay_label', is_dollar_amount, 'period_gross_pay',
    is_top_down_label_value_pair)
top_down_period_net_pay = _lv(
    'top-town period net pay', is_period_net_pay_label,
    'period_net_pay_label', is_dollar_amount, 'period_net_pay',
    is_top_down_label_value_pair)
top_down_ytd_gross_pay = _lv(
    'top-down YTD gross pay', is_ytd_gross_pay_label,
    'ytd_gross_pay_label', is_dollar_amount, 'ytd_gross_pay',
    is_top_down_label_value_pair)
top_down_ytd_net_pay = _lv(
    'top-down YTD net pay', is_ytd_net_pay_label, 'ytd_net_pay_label',
    is_dollar_amount, 'ytd_net_pay', is_top_down_label_value_pair)


def double_labeled_value(label1: Field, label1_description: Predicate,
                         label2: Field, label2_description: Predicate,
                         value: Field,
                         value_description: Predicate) -> Node:
  """A label-label-value triple: labels left of and above the value, in
  either configuration."""
  x1 = extract(
      label1_description(label1), label2_description(label2),
      value_description(value),
      tabular_row(label1, value), tabular_column(label2, value))
  x2 = extract(
      label1_description(label1), label2_description(label2),
      value_description(value),
      tabular_row(label2, value), tabular_column(label1, value))
  return pick_best(x1, x2).with_name(
      f'double_labeled_value({label1}, {label2}, {value})')


period_gross_pay_triple = double_labeled_value(
    'DLV_period_gross_pay_label', is_gross_pay_label,
    'DLV_gross_pay_period_label', is_period_pay_label,
    'period_gross_pay', is_dollar_amount)
period_net_pay_triple = double_labeled_value(
    'DLV_period_net_pay_label', is_net_pay_label,
    'DLV_net_pay_period_label', is_period_pay_label,
    'period_net_pay', is_dollar_amount)
ytd_gross_pay_triple = double_labeled_value(
    'DLV_ytd_gross_pay_label', is_gross_pay_label,
    'DLV_gross_pay_ytd_label', is_ytd_pay_label,
    'ytd_gross_pay', is_dollar_amount)
ytd_net_pay_triple = double_labeled_value(
    'DLV_ytd_net_pay_label', is_net_pay_label,
    'DLV_net_pay_ytd_label', is_ytd_pay_label,
    'ytd_net_pay', is_dollar_amount)

simple_earnings_table = extract(
    is_earnings_label('earnings_label'),
    is_period_pay_label('period_pay_label'),
    is_ytd_pay_label('ytd_pay_label'),
    is_permissive_gross_pay_label('gross_pay_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    row('earnings_label', 'period_pay_label', 'ytd_pay_label'),
    row('gross_pay_label', 'period_gross_pay', 'ytd_gross_pay'),
    no_words_between_horizontally('gross_pay_label', 'period_gross_pay'),
    no_words_between_horizontally('gross_pay_label', 'ytd_gross_pay'),
    left_aligned_column('earnings_label', 'gross_pay_label'),
    right_aligned_column('period_pay_label', 'period_gross_pay'),
    no_words_between_vertically('period_pay_label', 'period_gross_pay'),
    right_aligned_column('ytd_pay_label', 'ytd_gross_pay'),
    no_words_between_vertically('ytd_pay_label', 'ytd_gross_pay'),
).with_name('earnings table, label in header row')

headed_earnings_table = extract(
    is_earnings_label('earnings_label'),
    is_description_label('description_label'),
    is_period_pay_label('current_amount_label'),
    is_ytd_pay_label('ytd_amount_label'),
    is_permissive_gross_pay_label('total_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    is_immediate_header('earnings_label', 'description_label'),
    is_immediate_header('earnings_label', 'current_amount_label'),
    is_immediate_header('earnings_label', 'ytd_amount_label'),
    row('description_label', 'current_amount_label', 'ytd_amount_label'),
    row('total_label', 'period_gross_pay', 'ytd_gross_pay'),
    no_words_between_horizontally('total_label', 'period_gross_pay'),
    no_words_between_horizontally('total_label', 'ytd_gross_pay'),
    tabular_column('current_amount_label', 'period_gross_pay'),
    tabular_column('ytd_amount_label', 'ytd_gross_pay'),
).with_name('earnings table, label above header row')

double_headed_period_earnings_table = extract(
    any_holds(
        is_earnings_label,
        _label('--Current earnings--', 'Current earnings detail',
               'Current hours & earnings',
               'Pay period hours and earnings'),
        _whole('Current'))('current_earnings_label'),
    _label('Amount', 'Earnings', 'Total')('current_amount_label'),
    is_permissive_gross_pay_label('current_total_label'),
    is_dollar_amount('period_gross_pay'),
    is_immediate_header('current_earnings_label', 'current_amount_label'),
    tabular_row('current_total_label', 'period_gross_pay'),
    tabular_column('current_amount_label', 'period_gross_pay'),
).with_name('current pay period double-headed earnings table')

double_headed_ytd_earnings_table = extract(
    _label('Y-T-D earnings', 'Year-to-date',
           'Year to date hours & earnings', 'Earnings YTD',
           'YTD earnings')('ytd_earnings_label'),
    any_holds(
        _label('YTD Amount', 'Amount', 'Earnings'),
        _whole('YTD'))('ytd_amount_label'),
    any_holds(is_permissive_gross_pay_label,
              text_equals('Total YTD:'))('ytd_total_label'),
    is_dollar_amount('ytd_gross_pay'),
    is_immediate_header('ytd_earnings_label', 'ytd_amount_label'),
    tabular_row('ytd_total_label', 'ytd_gross_pay'),
    tabular_column('ytd_amount_label', 'ytd_gross_pay'),
).with_name('ytd double-headed earnings table')

long_tail_period_gross_pay = pick_best(
    ltr_period_gross_pay, top_down_period_gross_pay,
    period_gross_pay_triple, double_headed_period_earnings_table,
).with_name('long tail period gross pay')

long_tail_period_net_pay = pick_best(
    ltr_period_net_pay, top_down_period_net_pay, period_net_pay_triple,
    one_line_down_period_net_pay,
).with_name('period net pay')

long_tail_ytd_gross_pay = pick_best(
    ltr_ytd_gross_pay, top_down_ytd_gross_pay, ytd_gross_pay_triple,
    double_headed_ytd_earnings_table,
).with_name('ytd gross pay')

long_tail_ytd_net_pay = pick_best(
    ltr_ytd_net_pay, top_down_ytd_net_pay, ytd_net_pay_triple,
).with_name('ytd net pay')

long_tail_gross_pay_singletons = combine(
    long_tail_period_gross_pay, long_tail_ytd_gross_pay,
    allowed_to_overlap=[
        # Both DLV structures may share the same physical "gross pay"
        # label entity.
        {'DLV_period_gross_pay_label', 'DLV_ytd_gross_pay_label'},
    ],
).with_name('singletons')

long_tail_gross_pay = pick_best(
    simple_earnings_table, headed_earnings_table,
    long_tail_gross_pay_singletons,
).with_name('gross pay')

long_tail_net_pay = combine(
    long_tail_period_net_pay, long_tail_ytd_net_pay,
    allowed_to_overlap=[
        {'DLV_period_net_pay_label', 'DLV_ytd_net_pay_label'},
    ],
).with_name('net pay')

long_tail_gross_net_pay = combine(
    long_tail_gross_pay, long_tail_net_pay,
    allowed_to_overlap=[
        {'DLV_gross_pay_period_label', 'DLV_net_pay_period_label'},
        {'DLV_gross_pay_ytd_label', 'DLV_net_pay_ytd_label'},
    ],
).with_name('long tail gross/net pay')

long_tail_period_begin_date = pick_best(
    ltr_period_begin_date, top_down_period_begin_date,
).with_name('period begin')

long_tail_period_ending_date = pick_best(
    ltr_period_end_date, top_down_period_end_date,
).with_name('period end')

long_tail_pay_period = pick_best(
    combine(long_tail_period_begin_date, long_tail_period_ending_date)
    .with_name('separate pay period begin and ending dates'),
    pay_period_date_range,
).with_name('long tail period dates')

long_tail_pay_date = pick_best(
    ltr_pay_date, top_down_pay_date,
).with_name('pay date')

long_tail_dates = combine(
    long_tail_pay_period, long_tail_pay_date,
).with_name('long tail dates')

long_tail = combine(
    long_tail_gross_net_pay, long_tail_dates,
).with_name('long tail')


# ---------------------------------------------------------------------------
# Vendor templates.
# ---------------------------------------------------------------------------

paychex_left_to_right_net_pay = all_hold(
    are_arranged(Direction.LEFT_TO_RIGHT, taper=2),
    are_arranged(Direction.TOP_DOWN, min_distance=0, max_distance=1,
                 taper=2))

paychex = extract(
    text_equals('EARNINGS')('earnings_label'),
    text_equals('DESCRIPTION')('description_label'),
    text_equals('THIS PERIOD ($)')('period_pay_label'),
    text_equals('YTD ($)')('ytd_pay_label'),
    text_equals('Gross Earnings')('gross_earnings_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    text_equals('NET PAY')('net_pay_label'),
    is_dollar_amount('period_net_pay'),
    is_dollar_amount('ytd_net_pay'),
    text_equals('Pay Period:')('pay_period_label'),
    text_equals('Check Date:')('check_date_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    is_date('pay_date'),
    row('earnings_label', 'description_label', 'period_pay_label',
        'ytd_pay_label'),
    row('gross_earnings_label', 'period_gross_pay', 'ytd_gross_pay'),
    paychex_left_to_right_net_pay('net_pay_label', 'period_net_pay'),
    paychex_left_to_right_net_pay('net_pay_label', 'ytd_net_pay'),
    row('period_net_pay', 'ytd_net_pay'),
    left_aligned_column('earnings_label', 'net_pay_label'),
    left_aligned_column('description_label', 'gross_earnings_label'),
    right_aligned_column('period_pay_label', 'period_gross_pay',
                         'period_net_pay'),
    right_aligned_column('ytd_pay_label', 'ytd_gross_pay',
                         'ytd_net_pay'),
    is_left_to_right_label_value_pair('check_date_label', 'pay_date'),
    row('pay_period_label', 'period_begin_date', 'period_end_date'),
    nothing_between_horizontally('pay_period_label',
                                 'period_begin_date'),
).with_name('Paychex')

intuit_top_down_right_aligned_within_2_lines = all_hold(
    are_arranged(Direction.TOP_DOWN, max_distance=2, taper=2),
    are_aligned(AlignmentLine.RIGHT_SIDES, tolerance=1, taper=5))

intuit = extract(
    text_equals('Earnings and Hours')('earnings_and_hours_label'),
    text_equals('Current')('earnings_current_label'),
    text_equals('YTD Amount')('earnings_ytd_label'),
    text_equals('Taxes')('taxes_label'),
    text_equals('Current')('taxes_current_label'),
    text_equals('YTD Amount')('taxes_ytd_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    text_equals('Net Pay')('net_pay_label'),
    is_dollar_amount('period_net_pay'),
    is_dollar_amount('ytd_net_pay'),
    text_equals('Pay Period:')('pay_period_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    text_equals('Pay Date:')('pay_date_label'),
    is_date('pay_date'),
    row('earnings_and_hours_label', 'earnings_current_label',
        'earnings_ytd_label'),
    row('period_gross_pay', 'ytd_gross_pay'),
    row('taxes_label', 'taxes_current_label', 'taxes_ytd_label'),
    row('net_pay_label', 'period_net_pay', 'ytd_net_pay'),
    left_aligned_column('earnings_and_hours_label', 'net_pay_label'),
    right_aligned_column('earnings_current_label', 'period_gross_pay'),
    right_aligned_column('earnings_ytd_label', 'ytd_gross_pay'),
    intuit_top_down_right_aligned_within_2_lines(
        'period_gross_pay', 'taxes_current_label'),
    intuit_top_down_right_aligned_within_2_lines(
        'ytd_gross_pay', 'taxes_ytd_label'),
    right_aligned_column('taxes_current_label', 'period_net_pay'),
    right_aligned_column('taxes_ytd_label', 'ytd_net_pay'),
    row('pay_period_label', 'period_begin_date', 'period_end_date'),
    nothing_between_horizontally('pay_period_label',
                                 'period_begin_date'),
    is_left_to_right_label_value_pair('pay_date_label', 'pay_date'),
).with_name('Intuit')

summary_table = extract(
    text_equals('SUMMARY')('summary_label'),
    text_equals('Current')('summary_current_label'),
    text_equals('YTD')('summary_ytd_label'),
    text_equals('Total Pay')('summary_total_pay_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    text_equals('Period Beginning:')('period_begin_label'),
    text_equals('Period Ending:')('period_end_label'),
    text_equals('Pay Date:')('pay_date_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    is_date('pay_date'),
    row('summary_label', 'summary_current_label', 'summary_ytd_label'),
    row('summary_total_pay_label', 'period_gross_pay', 'ytd_gross_pay'),
    tabular_column('summary_label', 'summary_total_pay_label'),
    right_aligned_column('summary_current_label', 'period_gross_pay'),
    right_aligned_column('summary_ytd_label', 'ytd_gross_pay'),
    is_left_to_right_label_value_pair('period_begin_label',
                                      'period_begin_date'),
    is_left_to_right_label_value_pair('period_end_label',
                                      'period_end_date'),
    is_left_to_right_label_value_pair('pay_date_label', 'pay_date'),
).with_name('summary table')

summary_table_layout = combine(
    summary_table, ltr_period_net_pay,
).with_name('summary table')

ceridian_sloppy_top_down_right_aligned_very_close = all_hold(
    are_arranged(Direction.TOP_DOWN, max_distance=0.75, taper=2),
    are_aligned(AlignmentLine.RIGHT_SIDES, tolerance=5))

ceridian_left_to_right_and_top_down = all_hold(
    are_arranged(Direction.LEFT_TO_RIGHT, taper=0),
    are_arranged(Direction.TOP_DOWN, taper=2))

ceridian = extract(
    text_equals('Amount')('ytd_upper_amount_label'),
    text_equals('Amount')('current_upper_amount_label'),
    text_equals('Amount')('current_lower_amount_label'),
    text_equals('Amount')('ytd_lower_amount_label'),
    text_equals('Current')('current_label'),
    text_equals('YTD')('ytd_pay_label'),
    text_equals('Earnings')('earnings_label'),
    text_equals('Net Pay')('net_pay_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('period_net_pay'),
    is_dollar_amount('ytd_gross_pay'),
    is_dollar_amount('ytd_net_pay'),
    text_equals('Pay Date:')('pay_date_label'),
    is_date('pay_date'),
    text_equals('Pay Period:')('pay_period_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    left_aligned_column('pay_date_label', 'pay_period_label'),
    row('pay_date_label', 'pay_date'),
    row('pay_period_label', 'period_begin_date', 'period_end_date'),
    row('current_label', 'ytd_pay_label'),
    ceridian_left_to_right_and_top_down('current_label',
                                        'current_upper_amount_label'),
    ceridian_left_to_right_and_top_down('ytd_pay_label',
                                        'ytd_upper_amount_label'),
    row('current_upper_amount_label', 'ytd_upper_amount_label'),
    row('earnings_label', 'period_gross_pay', 'ytd_gross_pay'),
    ceridian_left_to_right_and_top_down('current_label',
                                        'current_lower_amount_label'),
    ceridian_left_to_right_and_top_down('ytd_pay_label',
                                        'ytd_lower_amount_label'),
    row('current_lower_amount_label', 'ytd_lower_amount_label'),
    row('net_pay_label', 'period_net_pay', 'ytd_net_pay'),
    left_aligned_column('earnings_label', 'net_pay_label'),
    nothing_between_vertically('current_upper_amount_label',
                               'period_gross_pay'),
    nothing_between_vertically('ytd_upper_amount_label',
                               'ytd_gross_pay'),
    ceridian_sloppy_top_down_right_aligned_very_close(
        'current_upper_amount_label', 'period_gross_pay'),
    right_aligned_column('current_upper_amount_label',
                         'current_lower_amount_label'),
    ceridian_sloppy_top_down_right_aligned_very_close(
        'current_lower_amount_label', 'period_net_pay'),
    right_aligned_column('period_gross_pay', 'period_net_pay'),
    ceridian_sloppy_top_down_right_aligned_very_close(
        'ytd_upper_amount_label', 'ytd_gross_pay'),
    right_aligned_column('ytd_upper_amount_label',
                         'ytd_lower_amount_label'),
    ceridian_sloppy_top_down_right_aligned_very_close(
        'ytd_lower_amount_label', 'ytd_net_pay'),
    right_aligned_column('ytd_gross_pay', 'ytd_net_pay'),
).with_name('Ceridian')

paycor = extract(
    text_equals('NET')('net_label'),
    is_dollar_amount('period_net_pay'),
    text_equals('TOTALS')('totals_label'),
    is_dollar_amount('period_gross_pay'),
    is_dollar_amount('ytd_gross_pay'),
    is_dollar_amount('period_taxes'),
    is_dollar_amount('ytd_taxes'),
    text_equals('CURRENT $')('current_dollars_label'),
    text_equals('YTD $')('ytd_dollars_label'),
    text_equals('DEDUCTION')('deduction_label'),
    text_equals('CURRENT $')('deduction_current_dollars_label'),
    text_equals('YTD $')('deduction_ytd_dollars_label'),
    text_equals('TAX')('tax_label'),
    text_equals('CURRENT $')('tax_current_dollars_label'),
    text_equals('YTD $')('tax_ytd_dollars_label'),
    text_equals('Check stub for the period')('period_begin_label'),
    text_equals('to')('period_end_label'),
    text_equals('with a pay date of')('pay_date_label'),
    is_date('period_begin_date'),
    is_date('period_end_date'),
    is_date('pay_date'),
    row('period_begin_label', 'period_begin_date'),
    row('period_end_label', 'period_end_date'),
    row('pay_date_label', 'pay_date'),
    right_aligned_column('period_begin_label', 'period_end_label',
                         'pay_date_label'),
    right_aligned_column('period_begin_date', 'period_end_date',
                         'pay_date'),
    row('current_dollars_label', 'ytd_dollars_label', 'deduction_label',
        'deduction_current_dollars_label', 'deduction_ytd_dollars_label',
        'tax_label', 'tax_current_dollars_label',
        'tax_ytd_dollars_label'),
    row('net_label', 'period_net_pay', 'totals_label',
        'period_gross_pay', 'ytd_gross_pay', 'period_taxes',
        'ytd_taxes'),
    right_aligned_column('current_dollars_label', 'period_gross_pay'),
    right_aligned_column('ytd_dollars_label', 'ytd_gross_pay'),
    right_aligned_column('tax_current_dollars_label', 'period_taxes'),
    right_aligned_column('tax_ytd_dollars_label', 'ytd_taxes'),
).with_name('Paycor')


# ---------------------------------------------------------------------------
# Business-logic inequalities + root.
# ---------------------------------------------------------------------------

cmp_net_gross = all_hold(
    sum_is_positive([1, -0.25], strict=False),
    sum_is_positive([-1, 1.50], strict=False))

cmp_period_ytd = all_hold(
    sum_is_positive([1, -0.01], strict=False),
    sum_is_positive([-1, 5.00], strict=False))

business_logic_inequalities = (
    cmp_net_gross('period_net_pay', 'period_gross_pay'),
    cmp_net_gross('ytd_net_pay', 'ytd_gross_pay'),
    cmp_period_ytd('period_net_pay', 'ytd_net_pay'),
    cmp_period_ytd('period_gross_pay', 'ytd_gross_pay'))

root = pick_best(
    paychex, summary_table_layout, intuit, ceridian, paycor, long_tail,
).with_extra_rules(*business_logic_inequalities)
