package org.polarsindex;

import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * Entry point for {@code spark.sql.extensions}: injects
 * {@link PostingsIndexRule} into the optimizer.
 *
 * <pre>
 * spark-submit \
 *   --jars polars-index-ext.jar \
 *   --conf spark.sql.extensions=org.polarsindex.PostingsIndexExtensions \
 *   --conf spark.polars.index.root=/path/to/index/catalog ...
 * </pre>
 */
public class PostingsIndexExtensions
    extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectOptimizerRule(
        new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(SparkSession session) {
            return new PostingsIndexRule(session);
          }
        });
    return BoxedUnit.UNIT;
  }
}
